"""Dtype policy: bf16 compute on the MXU, fp32 params/loss (SURVEY.md §7.1-1).

Parity note (SURVEY.md §7.2-3): PSNR parity at ±0.05 dB can be blown by bf16
accumulation alone, so every module takes its compute dtype from this policy
and the framework keeps an all-fp32 eval path (``DTypePolicy.fp32()``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    compute_dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    # accumulation / loss always fp32

    @classmethod
    def from_strings(cls, compute: str, param: str = "float32") -> "DTypePolicy":
        return cls(compute_dtype=_DTYPES[compute], param_dtype=_DTYPES[param])

    @classmethod
    def fp32(cls) -> "DTypePolicy":
        return cls(compute_dtype=jnp.float32, param_dtype=jnp.float32)

    def cast_input(self, x):
        return x.astype(self.compute_dtype)

    def cast_output(self, x):
        return x.astype(jnp.float32)
