from .camera import CameraParams, make_camera_params, pixel_directions  # noqa: F401
from .config import RasterConfig  # noqa: F401
from .projection import preprocess, covariance3d_packed  # noqa: F401
from .rasterize_dense import rasterize_dense, RasterOut  # noqa: F401
