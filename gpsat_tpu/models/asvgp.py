"""Actually-Sparse VGP local-expert model — B-spline inducing features
(reference parity: GPflowASVGPModel, GPSat/models/asvgp_model.py:18-214,
which wraps the unvendored external clone github.com/HJakeCunningham/ASVGP).

Identical interface to VFFModel (separable Matern product kernel on a
per-expert box domain, per-dim lengthscales + kernel_variance), but the
inter-domain features are uniform B-splines matched to the Matern order
(reference basis mapping: asvgp_model.py:154-165). `num_inducing_features`
is the number of basis functions per dimension; M_total = prod_d m_d.
"""

from gpsat_tpu.models.vff import VFFModel
from gpsat_tpu.ops import asvgp as asvgp_math


class ASVGPModel(VFFModel):
    """ASVGP expert: O(N M) feature build (banded), O(M^3)/iteration."""

    _math = asvgp_math
    _features_per_dim = staticmethod(lambda m: int(m))

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("jitter", asvgp_math.DEFAULT_JITTER)
        super().__init__(*args, **kwargs)
        degree = asvgp_math.spline_degree(self.kernel)
        for m in self.ms:
            assert m > degree, (
                f"ASVGP needs num_inducing_features > spline degree "
                f"({degree}) for kernel {self.kernel}; got {m}")
