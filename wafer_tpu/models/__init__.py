"""Physics model layer: potential families and initial conditions."""

from wafer_tpu.models.potentials import (  # noqa: F401
    Potentials,
    alphas,
    build_ab,
    generate,
    load_arrays,
    mu_debye,
    potential_sub_array,
    potential_sub_scalar,
)
from wafer_tpu.models.initial import (  # noqa: F401
    set_initial_conditions,
    symmetrise_wavefunction,
)
