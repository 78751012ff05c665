"""Domain-expert classifier subsystem (reference saber/classifier/*).

A small trainable head that filters AMG false positives: frozen SAM2
encoder features masked by ROI/RONI, or standalone conv backbones, trained
with focal loss and evaluated with macro P/R/F1. Training is pjit
data-parallel over the device mesh (replacing Lightning Fabric DDP,
SURVEY.md §2c.2).
"""

from saber_tpu.classifier.models import get_classifier_model  # noqa: F401
from saber_tpu.classifier.predictor import Predictor  # noqa: F401
