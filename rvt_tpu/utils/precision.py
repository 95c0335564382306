"""Mixed-precision helpers.

Policy: precision follows dtype (see rvt_tpu/__init__.py). The bf16
inference/serving path casts parameters and activations to bfloat16 —
BatchNorm running statistics stay float32, attention logits and box decode
are computed in float32 inside the modules (preferred_element_type /
explicit casts)."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_params_bf16(variables: Any) -> Any:
    """Cast the params collection to bf16; keep batch_stats in f32."""
    out = dict(variables)
    out["params"] = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        variables["params"])
    return out
