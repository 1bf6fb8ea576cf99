"""Offline data tooling: dataset converters/capture producing the on-disk
scene format (the L6 toolchain of SURVEY.md §1).

- waymo_convert: Waymo Open Dataset tfrecord -> scene directory
  (requires waymo-open-dataset + tensorflow; import-gated).
- carla_postprocess: CARLA capture output -> scene directory
  (numpy/PIL only).
- carla_capture: synchronous CARLA client recording the 5-camera rig
  (requires the carla package; import-gated).
"""
