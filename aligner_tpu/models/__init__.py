from .encoders import MelEncoder, TextEncoder
from .ota import OTAAligner, OTAConfig

__all__ = ["MelEncoder", "OTAAligner", "OTAConfig", "TextEncoder"]
