from jamun_tpu.metrics.base import (
    MeasureSamplingTimeCallback,
    TrajectoryMetric,
    TrajectoryMetricCallback,
)
from jamun_tpu.metrics.chemical_validity import ChemicalValidityMetrics
from jamun_tpu.metrics.dihedrals import compute_phi_psi, dihedral_angles, phi_psi_indices
from jamun_tpu.metrics.divergences import (
    histogram_jsd_2d,
    jensen_shannon_divergence,
    sliced_wasserstein_distance,
)
from jamun_tpu.metrics.ramachandran import RamachandranMetrics
from jamun_tpu.metrics.save_trajectory import SaveTrajectory
from jamun_tpu.metrics.score_distribution import ScoreDistributionMetrics
from jamun_tpu.metrics.visualize import SampleVisualizer, TrajectoryVisualizer
from jamun_tpu.metrics.posebusters import PoseBustersMetrics
