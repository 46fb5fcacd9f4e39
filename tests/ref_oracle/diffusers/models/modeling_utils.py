"""ModelMixin stand-in: nn.Module + ConfigMixin glue (device/dtype props).

Only the pieces the reference model classes actually touch — no hub loading.
"""

import torch
import torch.nn as nn

from diffusers.configuration_utils import ConfigMixin


class ModelMixin(nn.Module, ConfigMixin):
    _supports_gradient_checkpointing = False

    def __init__(self):
        super().__init__()

    # nn.Module defines __getattr__; chain to ConfigMixin's config fallback so
    # init bodies may read config keys via self.<key>.
    def __getattr__(self, name):
        try:
            return nn.Module.__getattr__(self, name)
        except AttributeError:
            return ConfigMixin.__getattr__(self, name)

    @property
    def device(self) -> torch.device:
        return next(self.parameters()).device

    @property
    def dtype(self) -> torch.dtype:
        return next(self.parameters()).dtype

    def enable_gradient_checkpointing(self):
        self.apply(lambda m: self._set_gradient_checkpointing(m, True))

    def disable_gradient_checkpointing(self):
        self.apply(lambda m: self._set_gradient_checkpointing(m, False))

    def num_parameters(self, only_trainable: bool = False) -> int:
        return sum(p.numel() for p in self.parameters() if p.requires_grad or not only_trainable)
