from .init import init_p_unsupervised, init_p_supervised, project_pca  # noqa: F401
from .engine import TrainConfig, NeuralAdmixtureTrainer  # noqa: F401
