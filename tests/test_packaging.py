"""Packaging metadata stays truthful: every console entry point resolves.

The reference has no packaging at all (three loose requirements_*.txt files,
README.md:96-111 install-by-hand instructions); durf_tpu ships a
pyproject.toml. This guards it against typos the same way test_cli.py guards
the .gin surface.
"""

import importlib
import pathlib
import tomllib

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_pyproject_parses_and_names_the_package():
    meta = _load()
    assert meta["project"]["name"] == "durf-tpu"
    assert "jax" in meta["project"]["dependencies"]
    assert meta["tool"]["setuptools"]["packages"]["find"]["include"] == ["durf_tpu*"]


def test_console_entry_points_resolve():
    # The CARLA/Waymo tools import their heavy deps lazily (inside main), so
    # every script target must import and expose a callable here.
    meta = _load()
    scripts = meta["project"]["scripts"]
    assert len(scripts) == 8
    for name, target in scripts.items():
        module, func = target.split(":")
        fn = getattr(importlib.import_module(module), func)
        assert callable(fn), (name, target)


def test_optional_extras_mirror_the_reference_requirement_sets():
    # requirements_{jax,carla,wod}.txt -> core deps + carla/waymo extras.
    extras = _load()["project"]["optional-dependencies"]
    for key in ("tensorboard", "lpips", "waymo", "carla", "test"):
        assert key in extras and extras[key]
