from rangeldm_tpu.training.train_state import TrainState, make_adamw  # noqa: F401
from rangeldm_tpu.training.ldm_trainer import (  # noqa: F401
    LdmTrainConfig, make_ldm_train_step,
)
from rangeldm_tpu.training.vae_trainer import (  # noqa: F401
    VaeLossConfig, make_vae_gan_steps,
)
