"""Device compute kernels: stencils, reductions, orthogonalisation."""

from wafer_tpu.ops.stencil import evolve_chunk, evolve_step, stencil_taps  # noqa: F401
from wafer_tpu.ops.observables import Observables, compute_observables  # noqa: F401
from wafer_tpu.ops.gram_schmidt import (  # noqa: F401
    get_norm_squared,
    normalise_wavefunction,
    orthogonalise_wavefunction,
)
