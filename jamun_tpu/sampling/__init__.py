from jamun_tpu.sampling.mcmc import ABOBA, BAOAB, MCMCConfig, initialize_velocity, make_processed_score_fn
from jamun_tpu.sampling.sampler import Sampler, unbatch_samples
from jamun_tpu.sampling.vesde import VESDEReverseDiffusionSampler
from jamun_tpu.sampling.walkjump import SingleMeasurementSampler
