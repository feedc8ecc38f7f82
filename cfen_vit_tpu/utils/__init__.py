from .images import tensor2im, save_image, mkdirs, save_images  # noqa: F401
from .html import HTML  # noqa: F401
from .visualizer import Visualizer  # noqa: F401
from .netinfo import print_networks, count_params  # noqa: F401
