from .warnings import warn_message_only, simplify_warning_format
from .dtypes import default_float, asarray_f
