from . import gaussians  # noqa: F401
from .gaussians import GaussianAux, GaussianParams  # noqa: F401
from .render import ViewInputs, render, render_view  # noqa: F401
