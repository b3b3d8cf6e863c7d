"""Composite encoding - splits input dims across nested encodings.

Mirror of the reference's CompositeEncoding
(/root/reference/include/tiny-cuda-nn/encodings/composite.h:136-290):

  - each nested encoding consumes a contiguous slice of the input dims,
    specified by `n_dims_to_encode` (at most one nested may omit it - it
    absorbs the remaining dims) and optionally `dims_to_encode_begin`;
  - reduction Concatenation (default) / Sum / Product;
  - for Concatenation, setting the composite's padded width pads the LAST
    nested encoding (composite.h:189-211); for Sum/Product all nested must
    share an output width and each is padded to the composite alignment, so
    padding values *reduce* across nested (pad sums to N for Sum etc.),
    matching the reference reduce kernels (composite.h:47-133).

Parameters of nested encodings are concatenated in nesting order inside the
composite's flat param slice.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import jax

from ...common import COMPUTE_DTYPE, ReductionType
from .base import Encoding


class CompositeEncoding(Encoding):
    def __init__(
        self,
        n_dims_to_encode: int,
        nested,  # list[Encoding]
        dims_to_encode_begin,  # list[int], parallel to `nested`
        reduction: ReductionType = ReductionType.Concatenation,
    ):
        super().__init__(n_dims_to_encode)
        self.nested = list(nested)
        self.dims_to_encode_begin = [int(o) for o in dims_to_encode_begin]
        self.reduction = reduction

        if self.reduction != ReductionType.Concatenation and self.nested:
            w = self.nested[0].n_output_dims
            for enc in self.nested:
                if enc.n_output_dims != w:
                    raise ValueError(
                        "Composite Sum/Product reduction requires equal nested "
                        f"output widths, got {[e.n_output_dims for e in self.nested]}"
                    )

    # -- shape contract -------------------------------------------------------
    @property
    def n_output_dims(self) -> int:
        if self.reduction == ReductionType.Concatenation:
            # nested paddings (except the last's) count as composite output
            total = sum(e.padded_output_width for e in self.nested[:-1])
            if self.nested:
                total += self.nested[-1].n_output_dims
            return total
        return self.nested[0].n_output_dims if self.nested else 0

    @property
    def padded_output_width(self) -> int:
        if self.reduction == ReductionType.Concatenation:
            return sum(e.padded_output_width for e in self.nested)
        return self.nested[0].padded_output_width if self.nested else 0

    def set_alignment(self, alignment: int) -> None:
        # composite.h:189-211: concat pads the last nested; reductions align
        # every nested identically.
        self._alignment = max(1, int(alignment))
        if self.reduction == ReductionType.Concatenation:
            if not self.nested:
                return
            prefix = sum(e.padded_output_width for e in self.nested[:-1])
            last = self.nested[-1]
            total = prefix + last.n_output_dims
            from ...common import next_multiple

            last.set_padded_output_width(
                next_multiple(total, self._alignment) - prefix
            )
        else:
            for e in self.nested:
                e.set_alignment(self._alignment)

    # -- params ---------------------------------------------------------------
    @property
    def n_params(self) -> int:
        return sum(e.n_params for e in self.nested)

    def init_params(self, key) -> np.ndarray:
        parts = []
        keys = jax.random.split(key, max(len(self.nested), 1))
        for enc, k in zip(self.nested, keys):
            parts.append(enc.init_params(k))
        if not parts:
            return np.zeros((0,), dtype=np.float32)
        return np.concatenate(parts).astype(np.float32)

    def layer_sizes(self):
        out = []
        for e in self.nested:
            out.extend(e.layer_sizes())
        return out

    # -- compute ---------------------------------------------------------------
    def apply_unpadded(self, params, x, *, compute_dtype=COMPUTE_DTYPE):
        raise NotImplementedError  # apply() is overridden wholesale

    def apply(self, params, x, *, compute_dtype=COMPUTE_DTYPE):
        outs = []
        p_off = 0
        for enc, begin in zip(self.nested, self.dims_to_encode_begin):
            p = params[p_off : p_off + enc.n_params]
            p_off += enc.n_params
            xi = x[:, begin : begin + enc.n_dims_to_encode]
            outs.append(enc.apply(p, xi, compute_dtype=compute_dtype))

        if not outs:
            return jnp.zeros((x.shape[0], 0), dtype=compute_dtype)

        if self.reduction == ReductionType.Concatenation:
            return jnp.concatenate(outs, axis=-1)
        stacked = jnp.stack(outs, axis=0)
        if self.reduction == ReductionType.Sum:
            return jnp.sum(stacked, axis=0)
        if self.reduction == ReductionType.Product:
            return jnp.prod(stacked, axis=0)
        raise ValueError(f"invalid reduction {self.reduction}")

    def hyperparams(self):
        return {
            "otype": "Composite",
            "reduction": self.reduction.value,
            "nested": [e.hyperparams() for e in self.nested],
        }
