from ffvd_tpu.model.params import GPSSMParams, SSMData, init_params_from_warmstart
from ffvd_tpu.model.elbo import negative_elbo, elbo_terms

__all__ = ["GPSSMParams", "SSMData", "init_params_from_warmstart",
           "negative_elbo", "elbo_terms"]
