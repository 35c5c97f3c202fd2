"""Device-mesh utilities + expert-batch scheduling."""

from gpsat_tpu.parallel.mesh import get_mesh, shard_experts, pad_to_multiple  # noqa: F401
from gpsat_tpu.parallel.scheduler import bucket_level, make_buckets, auto_batch_size  # noqa: F401
