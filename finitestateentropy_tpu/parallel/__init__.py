from .mesh import make_mesh, device_count
from .dp import sharded_fse_step, sharded_decode, sharded_encode
