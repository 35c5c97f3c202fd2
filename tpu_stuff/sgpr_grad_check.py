"""Numerical check of the analytic SGPR collapsed-ELBO gradient identities
that the fused Pallas kernel (ops/pallas_sgpr.py) implements.

Identities verified against jax.grad of ops.sgpr.neg_elbo (f64, CPU), with
padded data rows and padded inducing rows:

  A~  = W_u^T Kuf                 (W_u = U_u^{-1}, Kuu = U_u^T U_u)
  B   = I + s^-2 A~ A~^T,  U_B, W_B = U_B^{-1}
  a~  = A~ ybar,  dd = B^{-1} a~
  Kbar_uf = -s^-2 W_u [(I - B^{-1}) A~ + dd beta^T],
            beta = s^-2 ybar - s^-4 A~^T dd
  Kbar_uu = 0.5 W_u (B - 2I + B^{-1} + s^-4 dd dd^T) W_u^T
  g_theta = <Kbar_uu, dKuu/dtheta> + <Kbar_uf, dKuf/dtheta>
            + (s^-2/2) d trKff / dtheta
  g_s2    = 0.5 s^-2 (n - M + tr B^{-1})
            - 0.5 s^-4 (y.y - s^-2 a~.dd - s^-2 dd.dd)
            - 0.5 s^-4 (sf2 n - |A~|_F^2)
"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from gpsat_tpu.ops import sgpr
from gpsat_tpu.ops.kernels import kernel_fn

KERNEL = "Matern32"
JITTER = 1e-6

rng = np.random.default_rng(0)
N, M, D = 37, 11, 3
n_valid, m_valid = 29, 9
X = rng.normal(size=(N, D))
y = rng.normal(size=N)
mask = np.zeros(N, bool); mask[:n_valid] = True
Z = rng.normal(size=(M, D))
zmask = np.zeros(M, bool); zmask[:m_valid] = True
Z[~zmask] = 0.0

params = {"lengthscales": jnp.asarray(rng.uniform(0.5, 2.0, D)),
          "kernel_variance": jnp.asarray(1.7),
          "likelihood_variance": jnp.asarray(0.31)}

# reference: autodiff
f_ref, g_ref = jax.value_and_grad(
    lambda p: sgpr.neg_elbo(p, X, y, mask, Z, zmask, kernel=KERNEL,
                            jitter=JITTER))(params)

# analytic
k = kernel_fn(KERNEL)
ls, sf2, s2 = params["lengthscales"], params["kernel_variance"], params["likelihood_variance"]
m = mask.astype(float); zm = zmask.astype(float)
ybar = y * m
n = m.sum()

Kuu = k(Z, Z, ls, sf2) * (zm[:, None] * zm[None, :]) + np.diag(
    np.where(zmask, JITTER, 1.0))
Kuf = k(Z, X, ls, sf2) * (zm[:, None] * m[None, :])
Lu = np.linalg.cholesky(Kuu)
Wu = np.linalg.inv(Lu.T)            # U_u^{-1}, U_u = Lu^T
At = Wu.T @ Kuf                     # A~ = Lu^{-1} Kuf
B = np.eye(M) + At @ At.T / s2
UB = np.linalg.cholesky(B).T        # upper
WB = np.linalg.inv(UB)
at = At @ ybar
dd = np.linalg.solve(B, at)

val = (0.5 * n * np.log(2 * np.pi) + np.log(np.diag(UB)).sum()
       + 0.5 * n * np.log(s2) + 0.5 * ybar @ ybar / s2
       - 0.5 * at @ dd / s2**2
       + 0.5 * (sf2 * n - (At ** 2).sum()) / s2)
print("value:", float(f_ref), float(val), "diff", abs(float(f_ref) - val))

Binv = WB @ WB.T
beta = ybar / s2 - At.T @ dd / s2**2
Kbar_uf = -(Wu @ ((np.eye(M) - Binv) @ At + np.outer(dd, beta))) / s2
Kbar_uu = 0.5 * Wu @ (B - 2 * np.eye(M) + Binv
                      + np.outer(dd, dd) / s2**2) @ Wu.T

# tile-friendly decomposition check: B - 2I + B^{-1} = (U_B - W_B^T)^T (U_B - W_B^T)
Delta = UB - WB.T
assert np.allclose(Delta.T @ Delta, B - 2 * np.eye(M) + Binv, atol=1e-10)

# dK/dtheta via autodiff of the masked kernel builds (what the Pallas kernel
# does in closed form per tile)
def kuu_of(p):
    return kernel_fn(KERNEL)(Z, Z, p["lengthscales"], p["kernel_variance"]) \
        * (zm[:, None] * zm[None, :])
def kuf_of(p):
    return kernel_fn(KERNEL)(Z, X, p["lengthscales"], p["kernel_variance"]) \
        * (zm[:, None] * m[None, :])

kp = {"lengthscales": params["lengthscales"],
      "kernel_variance": params["kernel_variance"]}
_, vjp_uu = jax.vjp(kuu_of, kp)
_, vjp_uf = jax.vjp(kuf_of, kp)
g_uu = vjp_uu(jnp.asarray(Kbar_uu))[0]
g_uf = vjp_uf(jnp.asarray(Kbar_uf))[0]

g_ls = np.asarray(g_uu["lengthscales"]) + np.asarray(g_uf["lengthscales"])
g_sf2 = (float(g_uu["kernel_variance"]) + float(g_uf["kernel_variance"])
         + 0.5 * n / s2)   # trKff = sf2*n -> d/dsf2 = n
g_s2 = (0.5 / s2 * (n - M + np.trace(Binv))
        - 0.5 / s2**2 * (ybar @ ybar - at @ dd / s2 - dd @ dd / s2)
        - 0.5 / s2**2 * (sf2 * n - (At ** 2).sum()))

print("g_ls   ref", np.asarray(g_ref["lengthscales"]), "\n       ana", g_ls)
print("g_sf2  ref", float(g_ref["kernel_variance"]), " ana", g_sf2)
print("g_s2   ref", float(g_ref["likelihood_variance"]), " ana", g_s2)
assert np.allclose(g_ls, np.asarray(g_ref["lengthscales"]), rtol=1e-8)
assert np.isclose(g_sf2, float(g_ref["kernel_variance"]), rtol=1e-8)
assert np.isclose(g_s2, float(g_ref["likelihood_variance"]), rtol=1e-8)
assert np.isclose(float(val), float(f_ref), rtol=1e-10)
print("ALL ANALYTIC IDENTITIES OK")
