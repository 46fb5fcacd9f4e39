"""DiffusionPipeline stand-in: the base-class surface the reference pipeline
actually touches (pipeline_stable_video_diffusion_controlnet.py:99-599):
register_modules, _execution_device, progress_bar, maybe_free_model_hooks.
No hub loading, no offload — the parity gate constructs modules explicitly
(from_config + load_state_dict), mirroring from_pretrained's effect.
"""

import contextlib

import torch

from diffusers.configuration_utils import ConfigMixin


class _Bar:
    def __init__(self, total):
        self.total = total
        self.n = 0

    def update(self, k: int = 1):
        self.n += k


class DiffusionPipeline(ConfigMixin):
    def __init__(self):
        pass

    def register_modules(self, **kwargs):
        for name, module in kwargs.items():
            setattr(self, name, module)
        self._modules_registered = list(kwargs)

    @property
    def _execution_device(self) -> torch.device:
        return torch.device("cpu")

    @property
    def device(self) -> torch.device:
        return torch.device("cpu")

    @contextlib.contextmanager
    def progress_bar(self, iterable=None, total=None):
        yield _Bar(total)

    def maybe_free_model_hooks(self):
        pass

    def enable_model_cpu_offload(self, *a, **k):
        pass
