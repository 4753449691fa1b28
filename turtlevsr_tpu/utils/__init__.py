from turtlevsr_tpu.utils.logger import MessageLogger, get_env_info, get_root_logger  # noqa: F401
from turtlevsr_tpu.utils.misc import (  # noqa: F401
    get_time_str,
    make_exp_dirs,
    mkdir_and_rename,
    scandir,
    set_random_seed,
    sizeof_fmt,
)
from turtlevsr_tpu.utils.img import imwrite, img_from_float, float_from_img  # noqa: F401
