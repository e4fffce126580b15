from .boltzmann import (
    BoltzmannMoments as BoltzmannMoments,
    boltzmann_moments as boltzmann_moments,
    boltzmann_moments_shard_body as boltzmann_moments_shard_body,
    boltzmann_moments_xla as boltzmann_moments_xla,
    true_posterior_mean_x0 as true_posterior_mean_x0,
    true_score as true_score,
)
from .distance import (
    compute_gram_matrix as compute_gram_matrix,
    compute_pw_dist_sqr as compute_pw_dist_sqr,
    norm_sqr as norm_sqr,
)
from .groupnorm import (
    fused_group_norm_act as fused_group_norm_act,
    group_norm_reference as group_norm_reference,
    use_fused_groupnorm as use_fused_groupnorm,
)
from .knn import knn_sqdist as knn_sqdist
from .mmd import mmd_rbf as mmd_rbf
from .sqrtm import (
    sqrtm_newton_schulz as sqrtm_newton_schulz,
    trace_sqrtm_product as trace_sqrtm_product,
)
