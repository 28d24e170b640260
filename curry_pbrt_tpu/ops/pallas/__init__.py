"""Pallas TPU kernels — the hand-scheduled tier under ops/.

Kernels here exist where XLA's default schedule leaves bandwidth on the
table; everything has a pure-jnp reference implementation in ops/ that the
tests compare against bit-for-bit (same math, same masking).
"""

from curry_pbrt_tpu.ops.pallas.intersect_kernel import (  # noqa: F401
    tri_closest_hit_pallas,
    tri_any_hit_pallas,
)
from curry_pbrt_tpu.ops.pallas.aggregate import (  # noqa: F401
    make_pallas_intersectors,
)
