"""Core layer: constants, logging, configs, image I/O, z-stack discovery."""

from tmat_tpu.core.defs import (
    SUPPORTED_IMAGE_FORMATS,
    MAX_UINT8,
    MAX_UINT16,
    EPSILON,
    BASE_DIR,
    SCRIPT_CONFIG_DIR,
    MODEL_TRAINING_DIR,
    OUTPUT_DIR,
)
from tmat_tpu.core.log import SFM
from tmat_tpu.core.io import (
    PhysicalPixelSizes,
    ImageDims,
    load_image,
    get_image_dims,
    save_image,
    get_unique_output_filepath,
    get_img_mask_paths,
)
from tmat_tpu.core.zdiscovery import (
    ZStackInputError,
    clean_zstack_ids,
    find_zstack_image_sequences,
    find_zstack_files,
)
from tmat_tpu.core.config import load_tool_config, merge_cli_overrides
