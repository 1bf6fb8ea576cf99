"""Compatibility shims that let the REFERENCE code at /root/reference run
unmodified on the modern jax/flax in this image.

The head-to-head protocol (docs/STATUS.md round 2) trains the reference's own
train_boxpose.py and durf_tpu on the same scene with the same hyperparameters
and compares test PSNR/SSIM/depth-MSE. The reference was written against
jax 0.2 / flax 0.3 (requirements_jax.txt); this module recreates exactly the
API surface it touches — nothing here changes its numerics:

  * `gin`          — a mini gin-config: @configurable registration +
                      parse_config_files_and_bindings over the reference's own
                      .gin files (literal values only, which is all they use).
  * `flax.optim`   — the legacy Adam optimizer (flax/optim/adam.py semantics,
                      identical to optax.adam with eps_root=0): Adam(lr)
                      .create(target) -> Optimizer with .target/.state.step/
                      .apply_gradient(grad, learning_rate=...).
  * `flax.nn`      — relu/sigmoid/softplus aliases (utils.py:32-34 registers
                      them as gin externals).
  * `natsort`      — natsorted (obbpose_dataset.py:12).
  * `jax.tree_map`, `jax.host_id`, `jax.host_count` — removed aliases.
  * matplotlib FigureCanvas.tostring_rgb (train_boxpose.py:489; removed in
    matplotlib 3.10) — rebuilt from buffer_rgba.

Import this module BEFORE importing anything from /root/reference, then call
`install()`.
"""

from __future__ import annotations

import ast
import re
import sys
import types
from typing import Any, Dict


# ---------------------------------------------------------------------------
# mini gin
# ---------------------------------------------------------------------------


def _make_gin_module() -> types.ModuleType:
    gin = types.ModuleType("gin")
    bindings: Dict[str, Dict[str, Any]] = {}
    gin._bindings = bindings

    def _wrap(obj, name=None):
        reg_name = name or obj.__name__

        if isinstance(obj, type):

            def factory(*args, **kwargs):
                merged = dict(bindings.get(reg_name, {}))
                merged.update(kwargs)
                return obj(*args, **merged)

            factory.__name__ = reg_name
            factory.__qualname__ = getattr(obj, "__qualname__", reg_name)
            factory.__wrapped__ = obj
            return factory

        def fn_wrapper(*args, **kwargs):
            merged = dict(bindings.get(reg_name, {}))
            merged.update(kwargs)
            return obj(*args, **merged)

        fn_wrapper.__name__ = reg_name
        fn_wrapper.__wrapped__ = obj
        return fn_wrapper

    def configurable(*dargs, **dkwargs):
        # Supports @gin.configurable, @gin.configurable() and
        # @gin.configurable('name').
        if len(dargs) == 1 and callable(dargs[0]) and not dkwargs:
            return _wrap(dargs[0])
        name = dargs[0] if dargs else dkwargs.get("name")

        def deco(obj):
            return _wrap(obj, name)

        return deco

    def external_configurable(fn, *a, **kw):
        return fn

    def add_config_file_search_path(path):
        pass

    _line_re = re.compile(r"^([A-Za-z_][\w.]*)\.([\w]+)\s*=\s*(.+)$")

    def _parse_lines(lines):
        for raw in lines:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            m = _line_re.match(line)
            if not m:
                raise ValueError(f"gin shim cannot parse binding: {raw!r}")
            scope, param, value = m.groups()
            # The reference files only use literal values (strings, numbers,
            # bools, tuples) — no @references or macros.
            bindings.setdefault(scope, {})[param] = ast.literal_eval(value)

    def parse_config_files_and_bindings(files, params):
        for f in files or []:
            with open(f) as fh:
                _parse_lines(fh.read().splitlines())
        _parse_lines(params or [])

    gin.configurable = configurable
    gin.external_configurable = external_configurable
    gin.add_config_file_search_path = add_config_file_search_path
    gin.parse_config_files_and_bindings = parse_config_files_and_bindings
    gin.config = types.SimpleNamespace(external_configurable=external_configurable)
    return gin


# ---------------------------------------------------------------------------
# legacy flax.optim Adam
# ---------------------------------------------------------------------------


def _make_flax_optim_module() -> types.ModuleType:
    import jax
    import jax.numpy as jnp
    from flax import struct

    mod = types.ModuleType("flax.optim")

    @struct.dataclass
    class _AdamParamState:
        grad_ema: Any
        grad_sq_ema: Any

    @struct.dataclass
    class OptimizerState:
        step: Any
        param_states: Any

    @struct.dataclass
    class Optimizer:
        optimizer_def: Any = struct.field(pytree_node=False)
        state: OptimizerState = None
        target: Any = None

        def apply_gradient(self, grads, **hyper_param_overrides):
            return self.optimizer_def.apply_gradient_to(
                self.target, self.state, grads, **hyper_param_overrides
            ).replace(optimizer_def=self.optimizer_def)

    class Adam:
        """flax/optim/adam.py semantics: bias-corrected first/second moments,
        update = lr * m_hat / (sqrt(v_hat) + eps)."""

        def __init__(self, learning_rate=None, beta1=0.9, beta2=0.999, eps=1e-8,
                     weight_decay=0.0):
            self.learning_rate = learning_rate
            self.beta1 = beta1
            self.beta2 = beta2
            self.eps = eps
            self.weight_decay = weight_decay

        def create(self, target):
            param_states = jax.tree.map(
                lambda p: _AdamParamState(jnp.zeros_like(p), jnp.zeros_like(p)),
                target,
            )
            state = OptimizerState(jnp.asarray(0, jnp.int32), param_states)
            return Optimizer(optimizer_def=self, state=state, target=target)

        def apply_gradient_to(self, target, state, grads, learning_rate=None):
            lr = self.learning_rate if learning_rate is None else learning_rate
            t = state.step + 1
            b1, b2, eps, wd = self.beta1, self.beta2, self.eps, self.weight_decay

            def upd(p, g, s):
                g = g + wd * p if wd else g
                m = b1 * s.grad_ema + (1.0 - b1) * g
                v = b2 * s.grad_sq_ema + (1.0 - b2) * g * g
                m_hat = m / (1.0 - jnp.asarray(b1, m.dtype) ** t)
                v_hat = v / (1.0 - jnp.asarray(b2, v.dtype) ** t)
                new_p = p - lr * m_hat / (jnp.sqrt(v_hat) + eps)
                return new_p, _AdamParamState(m, v)

            flat_p, treedef = jax.tree_util.tree_flatten(target)
            flat_g = treedef.flatten_up_to(grads)
            flat_s = treedef.flatten_up_to(state.param_states)
            out = [upd(p, g, s) for p, g, s in zip(flat_p, flat_g, flat_s)]
            new_target = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
            new_states = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
            return Optimizer(
                optimizer_def=self,
                state=OptimizerState(t, new_states),
                target=new_target,
            )

    mod.Adam = Adam
    mod.Optimizer = Optimizer
    mod.OptimizerState = OptimizerState
    return mod


# ---------------------------------------------------------------------------
# natsort
# ---------------------------------------------------------------------------


def _make_natsort_module() -> types.ModuleType:
    mod = types.ModuleType("natsort")
    split_re = re.compile(r"(\d+)")

    def _key(s):
        return [int(p) if p.isdigit() else p for p in split_re.split(str(s))]

    def natsorted(seq, key=None):
        if key is None:
            return sorted(seq, key=_key)
        return sorted(seq, key=lambda x: _key(key(x)))

    mod.natsorted = natsorted
    return mod


def install() -> None:
    """Install all shims into sys.modules / live packages. Idempotent."""
    import jax
    import numpy as np

    if "gin" not in sys.modules:
        sys.modules["gin"] = _make_gin_module()
    if "natsort" not in sys.modules:
        sys.modules["natsort"] = _make_natsort_module()

    import flax

    if not hasattr(flax, "optim"):
        optim = _make_flax_optim_module()
        flax.optim = optim
        sys.modules["flax.optim"] = optim
    if not hasattr(flax, "nn"):
        nn_mod = types.ModuleType("flax.nn")
        nn_mod.relu = jax.nn.relu
        nn_mod.sigmoid = jax.nn.sigmoid
        nn_mod.softplus = jax.nn.softplus
        flax.nn = nn_mod
        sys.modules["flax.nn"] = nn_mod

    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree.map
    if not hasattr(jax, "host_id"):
        jax.host_id = jax.process_index
    if not hasattr(jax, "host_count"):
        jax.host_count = jax.process_count

    import matplotlib

    matplotlib.use("Agg", force=True)
    from matplotlib.backends.backend_agg import FigureCanvasAgg

    if not hasattr(FigureCanvasAgg, "tostring_rgb"):
        FigureCanvasAgg.tostring_rgb = lambda self: np.asarray(
            self.buffer_rgba()
        )[..., :3].tobytes()

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
