"""Multi-chip parallel layer: sharded SpMV, 2-D sector x dw meshes."""
from .sharded_spmv import make_sharded_matvec, pad_device_op, \
    sharded_matvec_flat, shard_local_kernel
from .multichip import make_mesh, make_batched_sharded_matvec, \
    stack_device_ops, lanczos_step
