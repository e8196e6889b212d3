from .abstract import AbstractDesignMatrix
from .dense import DenseDesignMatrix
from .sparse import SparseDesignMatrix
