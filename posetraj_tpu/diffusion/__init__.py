from posetraj_tpu.diffusion.euler_karras import (  # noqa: F401
    Schedule,
    make_schedule,
    training_sigmas_grid,
    scale_model_input,
    euler_step,
    add_noise,
    sigma_to_timestep,
)
from posetraj_tpu.diffusion.edm import (  # noqa: F401
    edm_scalings,
    edm_loss_weight,
    rand_cosine_interpolated,
)
