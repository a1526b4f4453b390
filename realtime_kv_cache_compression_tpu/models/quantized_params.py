"""Weight-only int8 quantization for the params pytree.

North-star capability ("quantized-inference engine"): per-output-channel
symmetric int8 weights halve both HBM footprint (Llama-2-7B: 12.9 GB → 6.6
GB, fitting 4K+ contexts on one 16 GB chip) and the weight-streaming floor
of decode latency. Norm vectors stay in full precision; the embedding table
quantizes per row (gather → scale).

Matmul execution: `llama._matmul` dispatches on `QuantizedTensor`. Default:
the XLA path dequantizes the weight operand into the dot (convert fuses on
TPU for streaming operands). With `act_quant=True`
(quantize_params(..., act_quant=True)), activations quantize per token on
the fly and the matmul runs int8 x int8 -> int32 on the MXU through
`ops/pallas/int8_matmul.py` — double the bf16 MXU rate on v5e.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedTensor:
    """Symmetric per-out-channel int8 weight: w ≈ q * scale.

    q: [in, out] int8; scale: [out] float32 (or [vocab] per-row for embed,
    with q laid out [vocab, hidden]).
    """

    q: Array
    scale: Array
    axis: int = dataclasses.field(metadata=dict(static=True), default=1)
    # int8 x int8 MXU path: quantize activations per token and run the
    # Pallas int8 matmul kernel instead of dequantizing the weight.
    act_quant: bool = dataclasses.field(metadata=dict(static=True),
                                        default=False)

    @property
    def shape(self):
        return self.q.shape

    def dequantize(self, dtype=jnp.bfloat16) -> Array:
        scale = self.scale
        if self.axis == 0:
            return (self.q.astype(jnp.float32)
                    * scale[:, None]).astype(dtype)
        return (self.q.astype(jnp.float32) * scale[None, :]).astype(dtype)


def quantize_tensor(w: Array, axis: int = 1,
                    act_quant: bool = False) -> QuantizedTensor:
    """Symmetric int8 quantization along `axis` (the preserved channel)."""
    wf = w.astype(jnp.float32)
    reduce_axis = 1 - axis
    absmax = jnp.max(jnp.abs(wf), axis=reduce_axis)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    scale_b = scale[:, None] if axis == 0 else scale[None, :]
    q = jnp.clip(jnp.round(wf / scale_b), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q=q, scale=scale, axis=axis, act_quant=act_quant)


_MATMUL_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_params(params: Dict[str, Any],
                    act_quant: bool = False) -> Dict[str, Any]:
    """Quantize all matmul weights (+ embed/lm_head) of a llama params tree.

    act_quant=True additionally routes these matmuls through the int8 x int8
    MXU kernel with on-the-fly activation quantization.
    """
    out: Dict[str, Any] = {}
    out["embed"] = quantize_tensor(params["embed"], axis=0)  # per-row
    out["final_norm"] = params["final_norm"]
    if "lm_head" in params:
        out["lm_head"] = quantize_tensor(params["lm_head"], axis=1,
                                         act_quant=act_quant)
    out["layers"] = []
    for layer in params["layers"]:
        ql = {}
        for k, v in layer.items():
            ql[k] = (quantize_tensor(v, axis=1, act_quant=act_quant)
                     if k in _MATMUL_KEYS else v)
        out["layers"].append(ql)
    return out


def quantize_params_streaming(params: Dict[str, Any],
                              act_quant: bool = False) -> Dict[str, Any]:
    """Like `quantize_params`, but CONSUMES the input tree: each fp weight is
    freed as soon as its int8 replacement exists, so peak HBM is
    fp_total + one tensor instead of fp_total + int8_total. Use when the fp
    params barely fit (e.g. Llama-2-7B bf16 = 12.9 GB on a 16 GB chip)."""
    out: Dict[str, Any] = {"layers": []}
    out["embed"] = quantize_tensor(params["embed"], axis=0)
    params["embed"] = None
    out["final_norm"] = params.pop("final_norm")
    if "lm_head" in params:
        out["lm_head"] = quantize_tensor(params["lm_head"], axis=1,
                                         act_quant=act_quant)
        params["lm_head"] = None
    layers = params["layers"]
    for i in range(len(layers)):
        layer = layers[i]
        ql = {}
        for k in list(layer.keys()):
            v = layer.pop(k)
            ql[k] = (quantize_tensor(v, axis=1, act_quant=act_quant)
                     if k in _MATMUL_KEYS else v)
            del v
        layers[i] = None
        out["layers"].append(ql)
    return out


def params_are_quantized(params: Any) -> bool:
    """True when the pytree carries int8 QuantizedTensor weights (used by
    the fused-decode auto heuristic: with int8 weights the weight-streaming
    floor halves and the decode-path tradeoff shifts — RESULTS.md)."""
    found = False

    def visit(x):
        nonlocal found
        if isinstance(x, QuantizedTensor):
            found = True
        return x

    jax.tree_util.tree_map(
        visit, params, is_leaf=lambda x: isinstance(x, QuantizedTensor))
    return found


def params_bytes(params: Any) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))
