from .base import Network  # noqa: F401
from .mlp import CutlassMLP, FullyFusedMLP  # noqa: F401
from .network_with_input_encoding import NetworkWithInputEncoding  # noqa: F401
