from sd_tpu.utils.fetch import download_with_md5, get_ckpt_path
from sd_tpu.utils.debug import enable_nan_debugging, nan_check
