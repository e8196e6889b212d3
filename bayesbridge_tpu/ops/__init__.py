from .summarizer import (
    summarizer_init, summarizer_update, extrapolate_coef_condmean,
    estimate_coef_precond_scale_sd, update_precond_hessian_pc,
    compute_prior_shrunk_scale,
)
from .cholesky import sample_gaussian_cholesky
from .cg import sample_gaussian_cg
