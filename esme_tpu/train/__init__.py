from .trainer import (ClassificationTrainer, MaskedPLM, RegressionTrainer,
                      TrainState)
from .optim import Adam8BitState, adam8bit
