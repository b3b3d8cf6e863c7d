from .adam import AdamOptimizer  # noqa: F401
from .base import Optimizer  # noqa: F401
from .composite import CompositeOptimizer  # noqa: F401
from .novograd import NovogradOptimizer  # noqa: F401
from .sgd import SGDOptimizer  # noqa: F401
from .shampoo import ShampooOptimizer  # noqa: F401
from .wrappers import (  # noqa: F401
    AverageOptimizer,
    BatchedOptimizer,
    EmaOptimizer,
    ExponentialDecayOptimizer,
    LookaheadOptimizer,
)
