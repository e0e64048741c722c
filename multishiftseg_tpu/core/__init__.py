from .config import Config, load_config
from .logging import MultiRunningMeter, RunningMeter, StepTimer, profiler_trace
from .mesh import fit_mesh_to_batch, make_mesh, shard_batch
