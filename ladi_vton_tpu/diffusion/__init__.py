from ladi_vton_tpu.diffusion.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    SchedulerConfig,
)
from ladi_vton_tpu.diffusion.text import encode_text_word_embedding
