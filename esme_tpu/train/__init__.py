from .trainer import (ClassificationTrainer, MaskedPLM, RegressionTrainer,
                      TrainState)
