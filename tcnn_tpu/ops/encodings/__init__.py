from .base import Encoding  # noqa: F401
from .composite import CompositeEncoding  # noqa: F401
from .fixed import (  # noqa: F401
    EmptyEncoding,
    FrequencyEncoding,
    IdentityEncoding,
    OneBlobEncoding,
    SphericalHarmonicsEncoding,
    TriangleWaveEncoding,
)
from .grid import GridEncoding  # noqa: F401
from .ppng import PPNG1Encoding, PPNG2Encoding, PPNG3Encoding  # noqa: F401
