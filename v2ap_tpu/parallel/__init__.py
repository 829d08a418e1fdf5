from v2ap_tpu.parallel.mesh import make_mesh, batch_sharding, replicated  # noqa: F401
from v2ap_tpu.parallel.sharding import shard_model, state_shardings, param_spec  # noqa: F401
