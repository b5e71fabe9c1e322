from .packing import (
    pack_grid,
    unpack_grid,
    packed_shape,
    seed_center,
    seed_random_block,
    to_reference_order,
    from_reference_order,
)
from .ca_reference import step_dense, run_dense
from .ca_step import step_packed, step_packed_multistate, make_step_fn

__all__ = [
    "pack_grid",
    "unpack_grid",
    "packed_shape",
    "seed_center",
    "seed_random_block",
    "to_reference_order",
    "from_reference_order",
    "step_dense",
    "run_dense",
    "step_packed",
    "step_packed_multistate",
    "make_step_fn",
]
