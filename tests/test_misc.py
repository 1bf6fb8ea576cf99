"""Coverage for metrics, config-parser error paths, and NDC ray generation."""

import json
import os

import numpy as np
import pytest

from durf_tpu import rays as raylib
from durf_tpu.configs import Config, load_config, parse_gin_lines
from durf_tpu.metrics import MetricsWriter, Throughput


class TestMetrics:
    def test_writer_scalars_and_jsonl(self, tmp_path):
        w = MetricsWriter(str(tmp_path), enable_tensorboard=False)
        w.scalars(10, {"a": 1.5, "b": np.float32(2.0)})
        w.close()
        rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert rows[0] == {"step": 10, "a": 1.5, "b": 2.0}

    def test_throughput_counters(self):
        t = Throughput(batch_size=100, samples_per_ray=8)
        t.tick(5)
        out = t.report()
        assert out["perf/rays_per_sec"] == out["perf/steps_per_sec"] * 100
        assert out["perf/ray_samples_per_sec"] == out["perf/rays_per_sec"] * 8


class TestConfigParser:
    def test_unknown_scope_raises(self):
        with pytest.raises(ValueError, match="unknown config scope"):
            parse_gin_lines(Config(), ["Bogus.field = 1"])

    def test_unknown_field_raises(self):
        with pytest.raises(ValueError, match="unknown config field"):
            parse_gin_lines(Config(), ["Config.not_a_field = 1"])

    def test_comments_and_blank_lines_skipped(self):
        cfg = parse_gin_lines(Config(), ["# comment", "", "Config.near = 3.5  # inline"])
        assert cfg.near == 3.5

    def test_activation_names(self):
        cfg = parse_gin_lines(Config(), ["MLP.net_activation = @flax.nn.relu"])
        assert cfg.model.mlp.net_activation == "relu"

    def test_tuple_values(self):
        cfg = parse_gin_lines(Config(), ["Config.c2f_steps = (1, 2, 3)"])
        assert cfg.c2f_steps == (1, 2, 3)


class TestNdcRays:
    def test_ndc_ray_properties(self):
        c2w = np.eye(3, 4, dtype=np.float32)
        c2w[2, 3] = 1.0  # camera slightly up the +z axis, looking down -z
        r = raylib.camera_rays(c2w, 32, 24, 30.0, near=0.0, far=1.0, use_ndc=True)
        # NDC d2 is constant 2*near/|oz| -> here directions all share d2.
        d2 = np.asarray(r.directions[..., 2])
        assert np.allclose(d2, d2.flat[0], atol=1e-5)
        # Origins sit on the near plane: o2 = 1 + 2*near/oz = 1 - 2 = -1.
        np.testing.assert_allclose(np.asarray(r.origins[..., 2]), -1.0, atol=1e-5)
        # viewdirs are the raw world directions (pre-NDC).
        assert r.viewdirs.shape == (24, 32, 3)
        assert np.asarray(r.viewdirs[..., 2]).max() < 0

    def test_pinhole_principal_point(self):
        c2w = np.eye(3, 4, dtype=np.float32)
        o, d, v = raylib.pinhole_rays(c2w, 8, 6, 10.0, principal_point=np.array([2.0, 3.0]))
        # The ray through the principal point is the optical axis.
        np.testing.assert_allclose(d[3, 2], [0.0, 0.0, -1.0], atol=1e-6)
