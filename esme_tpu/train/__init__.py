from .trainer import MaskedPLM, RegressionTrainer, TrainState
