from ladi_vton_tpu.diffusion.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
    LMSDiscreteScheduler,
    PNDMScheduler,
    SchedulerConfig,
    make_scheduler,
)
from ladi_vton_tpu.diffusion.text import encode_text_word_embedding
