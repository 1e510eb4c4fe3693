from .metrics import psnr, ssim
from .scorer import Scorer
from .classifier import DegradationClassifier, SEVERITY_LEVELS, DEGRADATIONS

__all__ = ["psnr", "ssim", "Scorer", "DegradationClassifier",
           "SEVERITY_LEVELS", "DEGRADATIONS"]
