from .tilted_stable import sample_tilted_stable
from .polya_gamma import sample_polya_gamma, sample_unit_shape_polya_gamma
from .basic import BasicRandom
