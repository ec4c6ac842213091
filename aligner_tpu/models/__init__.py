from .encoders import MelEncoder, TextEncoder
from .mobo import MoBoAligner, MoBoConfig
from .ota import OTAAligner, OTAConfig

__all__ = ["MelEncoder", "MoBoAligner", "MoBoConfig", "OTAAligner",
           "OTAConfig", "TextEncoder"]
