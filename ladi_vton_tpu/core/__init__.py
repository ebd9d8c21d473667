from ladi_vton_tpu.core.dtypes import DTypePolicy, default_policy
from ladi_vton_tpu.core.mesh import MeshSpec, make_mesh, data_sharding, replicated
