from .misc import batch_jacobian as batch_jacobian, compute_cdf as compute_cdf
from .synthetic import (
    generate_anisotropic_gmm as generate_anisotropic_gmm,
    generate_cross_polytope as generate_cross_polytope,
    generate_dataset as generate_dataset,
    generate_gaussian as generate_gaussian,
    generate_gmm_1d as generate_gmm_1d,
    generate_simplex as generate_simplex,
    sample_on_hypersphere as sample_on_hypersphere,
)
from .timing import Timer as Timer, sync as sync
