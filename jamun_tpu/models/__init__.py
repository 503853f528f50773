from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig, normalization_factors
from jamun_tpu.models.e3conv import E3Conv, irreps_to_vector, vector_to_irreps
from jamun_tpu.models.embeddings import (
    AtomEmbeddingWithResidueInformation,
    CoarseGrainedBeadEmbedding,
    SimpleAtomEmbedding,
)
from jamun_tpu.models.noise_conditioning import (
    NoiseConditionalScaling,
    NoiseConditionalSkipConnection,
    NoiseEmbedding,
)
from jamun_tpu.models.ophiuchus import Ophiuchus, tensor_square
