from .mesh import make_mesh
from .sharded import sharded_evidence_step, make_example_batch
