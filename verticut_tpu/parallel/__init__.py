from verticut_tpu.parallel.mesh import make_mesh, mesh_axes  # noqa: F401
from verticut_tpu.parallel import collectives  # noqa: F401
