"""JAX bijectors for constrained hyperparameter optimisation.

Optimisation runs in unconstrained space; these map unconstrained variables to
constrained parameters and back (reference semantics: GPflow's Sigmoid/Softplus
transforms, GPSat/models/gpflow_models.py:488-494 and GPSat/utils.py:2320-2400).

Bijectors are registered pytrees so they can be passed straight through
jit/vmap: array-valued bounds are leaves, the class is static structure.
"""

import jax
import jax.numpy as jnp


class Bijector:
    """forward: unconstrained -> constrained; inverse: constrained -> unconstrained."""

    def forward(self, u):
        raise NotImplementedError

    def inverse(self, v):
        raise NotImplementedError

    def tree_flatten(self):
        return (), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls()

    def __repr__(self):
        return type(self).__name__


@jax.tree_util.register_pytree_node_class
class Identity(Bijector):
    def forward(self, u):
        return u

    def inverse(self, v):
        return v


@jax.tree_util.register_pytree_node_class
class Exp(Bijector):
    def forward(self, u):
        return jnp.exp(u)

    def inverse(self, v):
        return jnp.log(v)


@jax.tree_util.register_pytree_node_class
class Softplus(Bijector):
    """v = log(1 + e^u) + shift, numerically stable in both directions."""

    def __init__(self, shift=0.0):
        self.shift = jnp.asarray(shift)

    def forward(self, u):
        return jax.nn.softplus(u) + self.shift

    def inverse(self, v):
        y = v - self.shift
        # log(e^y - 1) = y + log(1 - e^-y), stable for large y; log(y) for tiny y
        y_safe = jnp.maximum(y, 1e-300)
        small = y_safe < 1e-10
        out = jnp.where(small,
                        jnp.log(y_safe),
                        y_safe + jnp.log(-jnp.expm1(-jnp.where(small, 1.0, y_safe))))
        return jnp.where(y <= 0, -jnp.inf, out)

    def tree_flatten(self):
        return (self.shift,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self):
        return f"Softplus(shift={self.shift})"


@jax.tree_util.register_pytree_node_class
class Sigmoid(Bijector):
    """v = low + (high - low) * sigmoid(u); box constraint (low, high)."""

    def __init__(self, low=0.0, high=1.0):
        self.low = jnp.asarray(low)
        self.high = jnp.asarray(high)

    def forward(self, u):
        return self.low + (self.high - self.low) * jax.nn.sigmoid(u)

    def inverse(self, v):
        z = (v - self.low) / (self.high - self.low)
        z = jnp.clip(z, 0.0, 1.0)
        out = jnp.log(z) - jnp.log1p(-z)
        return out

    def tree_flatten(self):
        return (self.low, self.high), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self):
        return f"Sigmoid(low={self.low}, high={self.high})"


def get_bijector(func=None, low=None, high=None, shift=None, **kwargs):
    """Construct a bijector from config-style keyword arguments.

    Mirrors the reference's constraint-guessing: low+high -> Sigmoid;
    shift (or nothing) -> Softplus; 'exp' -> Exp
    (reference: GPSat/models/pure_python_gpr.py:85-93,128-140).
    """
    if func is None:
        func = "sigmoid" if (low is not None and high is not None) else "softplus"
    if isinstance(func, Bijector):
        return func
    func = func.lower()
    if func == "softplus":
        return Softplus(shift=0.0 if shift is None else shift)
    if func == "sigmoid":
        return Sigmoid(low=0.0 if low is None else low, high=1.0 if high is None else high)
    if func == "exp":
        return Exp()
    if func in ("identity", "none"):
        return Identity()
    raise NotImplementedError(f"bijector func: {func} is not implemented")
