"""User-facing module API - the analog of the reference's PyTorch extension.

Mirrors tcnn's Python classes (bindings/torch/tinycudann/modules.py:209-329):
`NetworkWithInputEncoding`, `Network`, `Encoding` - stateful wrappers around
the functional core that

  - hold the flat fp32 parameter vector (`.params`),
  - pad the batch up to BATCH_SIZE_GRANULARITY and slice the output back
    (modules.py:181-192),
  - trim the padded output width to `n_output_dims`,
  - expose `fwd` / `bwd` / `bwd_bwd_input` equivalents through JAX autodiff:
    __call__ is differentiable to arbitrary order w.r.t. both the input and
    `.params` (the reference needs hand-written second-order kernels for
    this; here grad-of-grad just works).

`Network` routes through an Identity encoding exactly like the reference's
cpp_api (src/cpp_api.cu:151-153), so narrow inputs are one-padded to the
network's input alignment (an effective bias channel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .common import BATCH_SIZE_GRANULARITY, COMPUTE_DTYPE, next_multiple
from .config import create_network_with_input_encoding
from .registry import create_encoding


@jax.jit
def _vjp_input_only(vjp, dL_dy):
    return vjp(dL_dy)[1]


class Module:
    """Base: stateful parameter holder over a functional model."""

    def __init__(self, model, seed: int = 1337, output_dtype=jnp.float32):
        import inspect

        self.model = model
        self.params = jnp.asarray(
            model.init_params(jax.random.PRNGKey(seed)), jnp.float32
        )
        self.output_dtype = output_dtype
        self._accepts_pig = (
            "prepare_input_gradients"
            in inspect.signature(model.apply).parameters
        )
        self._apply = jax.jit(self._apply_fn, static_argnums=(2,))

    # -- pickling (modules.py:194-204 in the reference torch binding) -------
    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("_apply", None)  # jitted callables don't pickle
        state["params"] = np.asarray(state["params"])
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self.params = jnp.asarray(self.params, jnp.float32)
        self._apply = jax.jit(self._apply_fn, static_argnums=(2,))

    # functional core: padded-batch in, trimmed output out
    def _apply_fn(self, params, x, prepare_input_gradients=False):
        kwargs = (
            {"prepare_input_gradients": prepare_input_gradients}
            if self._accepts_pig
            else {}
        )
        y = self.model.apply(params, x, compute_dtype=COMPUTE_DTYPE, **kwargs)
        return y[:, : self.n_output_dims].astype(self.output_dtype)

    def __call__(self, x, params=None, prepare_input_gradients=False):
        """Set prepare_input_gradients=True when differentiating w.r.t. `x`
        (modules.py:91-104 passes x.requires_grad in the reference) - it
        routes around kernels whose backward skips input gradients."""
        params = self.params if params is None else params
        b = x.shape[0]
        padded_b = next_multiple(max(b, 1), BATCH_SIZE_GRANULARITY)
        if padded_b != b:
            x = jnp.pad(x, ((0, padded_b - b), (0, 0)), constant_values=1.0)
        y = self._apply(params, x, prepare_input_gradients)
        return y[:b]

    # -- explicit autodiff endpoints (bindings.cpp fwd/bwd/bwd_bwd_input) --
    def fwd(self, x, params=None):
        params = self.params if params is None else params
        y, vjp = jax.vjp(
            lambda p, xx: self.__call__(xx, p, prepare_input_gradients=True),
            params,
            x,
        )
        return y, vjp

    def bwd(self, vjp, dL_dy, gradient_mode=None, param_grads=None):
        """(dL_dparams, dL_dinput) - the reference returns (input, params)
        grads from Module::bwd (bindings.cpp:112-171).

        `gradient_mode` implements the reference's GradientMode semantics
        (object.h:115-119, applied at object.h:219-276) functionally:
        Overwrite (default) returns fresh parameter gradients; Accumulate
        adds them into `param_grads` (the reference's +=-into-buffer);
        Ignore returns None for the parameter gradients."""
        from .common import GradientMode

        mode = GradientMode.Overwrite if gradient_mode is None else gradient_mode
        if mode == GradientMode.Ignore:
            # the reference's Ignore skips the parameter-gradient kernels
            # entirely (object.h:115-119); here the vjp runs under jit with
            # only dL_dinput extracted, so XLA dead-code-eliminates the
            # table scatter and wgrad matmuls instead of computing and
            # discarding them (jax.vjp's closure is a tree_util.Partial,
            # so it can be a jit argument and the trace is cached)
            return None, _vjp_input_only(vjp, dL_dy)
        dparams, dx = vjp(dL_dy)
        if mode == GradientMode.Accumulate:
            if param_grads is None:
                raise ValueError(
                    "GradientMode.Accumulate requires param_grads to add into"
                )
            return param_grads + dparams, dx
        return dparams, dx

    @property
    def n_params(self) -> int:
        return self.model.n_params

    def initial_params(self, seed: int = 1337):
        return jnp.asarray(
            self.model.init_params(jax.random.PRNGKey(seed)), jnp.float32
        )

    @property
    def n_output_dims(self) -> int:
        return self.model.n_output_dims

    def hyperparams(self):
        return self.model.hyperparams()


class NetworkWithInputEncoding(Module):
    def __init__(
        self,
        n_input_dims: int,
        n_output_dims: int,
        encoding_config: dict,
        network_config: dict,
        seed: int = 1337,
    ):
        self.n_input_dims = int(n_input_dims)
        model = create_network_with_input_encoding(
            n_input_dims, n_output_dims, encoding_config, network_config
        )
        super().__init__(model, seed=seed)


class Network(Module):
    def __init__(
        self,
        n_input_dims: int,
        n_output_dims: int,
        network_config: dict,
        seed: int = 1337,
    ):
        self.n_input_dims = int(n_input_dims)
        model = create_network_with_input_encoding(
            n_input_dims, n_output_dims, {"otype": "Identity"}, network_config
        )
        super().__init__(model, seed=seed)


class Encoding(Module):
    def __init__(
        self,
        n_input_dims: int,
        encoding_config: dict,
        seed: int = 1337,
        dtype=None,
    ):
        self.n_input_dims = int(n_input_dims)
        enc = create_encoding(n_input_dims, encoding_config)
        model = _EncodingModel(enc)
        super().__init__(
            model,
            seed=seed,
            output_dtype=jnp.float32 if dtype in (None, jnp.float32) else dtype,
        )


class _EncodingModel:
    """Adapter giving a bare Encoding the Network-ish model interface."""

    def __init__(self, encoding):
        self.encoding = encoding

    @property
    def n_output_dims(self):
        return self.encoding.n_output_dims

    @property
    def n_params(self):
        return self.encoding.n_params

    def layer_sizes(self):
        return self.encoding.layer_sizes()

    def init_params(self, key):
        return self.encoding.init_params(key)

    def apply(self, params, x, *, compute_dtype=COMPUTE_DTYPE):
        return self.encoding.apply(params, x, compute_dtype=compute_dtype)

    def hyperparams(self):
        return self.encoding.hyperparams()
