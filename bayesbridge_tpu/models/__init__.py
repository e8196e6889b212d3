from .abstract import AbstractModel
from .linear import LinearModel
from .logistic import LogisticModel
from .cox import CoxModel
from .factory import RegressionModel
