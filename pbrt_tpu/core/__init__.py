from pbrt_tpu.core import math as vecmath  # noqa: F401
from pbrt_tpu.core import transform, spectrum, sampling  # noqa: F401
