"""AutoencoderKLTemporalDecoder — faithful torch stand-in for diffusers
0.24.0 (models/autoencoder_kl_temporal_decoder.py + the Encoder /
DownEncoderBlock2D / UNetMidBlock2D pieces of models/vae.py +
models/unet_2d_blocks.py it instantiates).

The reference repo does NOT vendor the VAE — it loads
`AutoencoderKLTemporalDecoder.from_pretrained(..., subfolder="vae")` from the
installed diffusers package (train_svd_traj_blender_14.py:880-884). This
module re-derives that architecture in torch, independently from our JAX
rebuild (posetraj_tpu/models/vae.py), so the two can be cross-checked:
matching state_dict key/shape sets validate the converter's name rules, and
fp32 forward agreement validates the math (incl. the decoder's "learned"
AlphaBlender branch and the final (3,1,1) time_conv_out frame mixing, which
the UNet oracle never exercises).
"""

from typing import Optional, Tuple

import torch
import torch.nn as nn

from diffusers.configuration_utils import register_to_config

from .attention_processor import Attention
from .modeling_utils import ModelMixin
from .resnet import Downsample2D, ResnetBlock2D, SpatioTemporalResBlock, Upsample2D


class DownEncoderBlock2D(nn.Module):
    """unet_2d_blocks.py DownEncoderBlock2D (temb-free resnets + optional
    asymmetric-pad downsample, downsample_padding=0 in the VAE Encoder)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        num_layers: int = 1,
        resnet_eps: float = 1e-6,
        resnet_groups: int = 32,
        add_downsample: bool = True,
        downsample_padding: int = 1,
    ):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            input_channels = in_channels if i == 0 else out_channels
            resnets.append(
                ResnetBlock2D(
                    in_channels=input_channels,
                    out_channels=out_channels,
                    temb_channels=None,
                    eps=resnet_eps,
                    groups=resnet_groups,
                )
            )
        self.resnets = nn.ModuleList(resnets)
        if add_downsample:
            self.downsamplers = nn.ModuleList(
                [Downsample2D(out_channels, use_conv=True, out_channels=out_channels,
                              padding=downsample_padding, name="op")]
            )
        else:
            self.downsamplers = None

    def forward(self, hidden_states):
        for resnet in self.resnets:
            hidden_states = resnet(hidden_states, temb=None)
        if self.downsamplers is not None:
            for downsampler in self.downsamplers:
                hidden_states = downsampler(hidden_states)
        return hidden_states


class UNetMidBlock2D(nn.Module):
    """unet_2d_blocks.py UNetMidBlock2D, add_attention=True, num_layers=1:
    resnet -> (attn -> resnet). Single-head residual attention with the
    deprecated-attn-block config (norm_num_groups, bias=True)."""

    def __init__(
        self,
        in_channels: int,
        temb_channels: Optional[int] = None,
        resnet_eps: float = 1e-6,
        resnet_groups: int = 32,
        attention_head_dim: Optional[int] = None,
        num_layers: int = 1,
    ):
        super().__init__()
        attention_head_dim = attention_head_dim or in_channels
        resnets = [
            ResnetBlock2D(in_channels=in_channels, out_channels=in_channels,
                          temb_channels=temb_channels, eps=resnet_eps, groups=resnet_groups)
        ]
        attentions = []
        for _ in range(num_layers):
            attentions.append(
                Attention(
                    in_channels,
                    heads=in_channels // attention_head_dim,
                    dim_head=attention_head_dim,
                    rescale_output_factor=1.0,
                    eps=resnet_eps,
                    norm_num_groups=resnet_groups,
                    residual_connection=True,
                    bias=True,
                    upcast_softmax=True,
                )
            )
            resnets.append(
                ResnetBlock2D(in_channels=in_channels, out_channels=in_channels,
                              temb_channels=temb_channels, eps=resnet_eps, groups=resnet_groups)
            )
        self.attentions = nn.ModuleList(attentions)
        self.resnets = nn.ModuleList(resnets)

    def forward(self, hidden_states, temb=None):
        hidden_states = self.resnets[0](hidden_states, temb)
        for attn, resnet in zip(self.attentions, self.resnets[1:]):
            hidden_states = attn(hidden_states)
            hidden_states = resnet(hidden_states, temb)
        return hidden_states


class Encoder(nn.Module):
    """vae.py Encoder (double_z=True): per-frame 2D downsampling stack."""

    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 4,
        block_out_channels: Tuple[int, ...] = (64,),
        layers_per_block: int = 2,
        norm_num_groups: int = 32,
    ):
        super().__init__()
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], kernel_size=3, stride=1, padding=1)
        self.down_blocks = nn.ModuleList([])
        output_channel = block_out_channels[0]
        for i, ch in enumerate(block_out_channels):
            input_channel = output_channel
            output_channel = ch
            is_final_block = i == len(block_out_channels) - 1
            self.down_blocks.append(
                DownEncoderBlock2D(
                    in_channels=input_channel,
                    out_channels=output_channel,
                    num_layers=layers_per_block,
                    resnet_eps=1e-6,
                    resnet_groups=norm_num_groups,
                    add_downsample=not is_final_block,
                    downsample_padding=0,
                )
            )
        self.mid_block = UNetMidBlock2D(
            in_channels=block_out_channels[-1],
            resnet_eps=1e-6,
            resnet_groups=norm_num_groups,
            attention_head_dim=block_out_channels[-1],
            temb_channels=None,
        )
        self.conv_norm_out = nn.GroupNorm(num_channels=block_out_channels[-1],
                                          num_groups=norm_num_groups, eps=1e-6)
        self.conv_act = nn.SiLU()
        self.conv_out = nn.Conv2d(block_out_channels[-1], 2 * out_channels, 3, padding=1)

    def forward(self, sample):
        sample = self.conv_in(sample)
        for down_block in self.down_blocks:
            sample = down_block(sample)
        sample = self.mid_block(sample)
        sample = self.conv_norm_out(sample)
        sample = self.conv_act(sample)
        return self.conv_out(sample)


class MidBlockTemporalDecoder(nn.Module):
    """unet_3d_blocks.py MidBlockTemporalDecoder: SpatioTemporalResBlocks with
    merge_strategy="learned" + switch_spatial_to_temporal_mix, one residual
    single-head attention between resnets[0] and resnets[1]."""

    def __init__(self, in_channels: int, out_channels: int,
                 attention_head_dim: int = 512, num_layers: int = 1):
        super().__init__()
        resnets = []
        attentions = []
        for i in range(num_layers):
            input_channels = in_channels if i == 0 else out_channels
            resnets.append(
                SpatioTemporalResBlock(
                    in_channels=input_channels,
                    out_channels=out_channels,
                    temb_channels=None,
                    eps=1e-6,
                    temporal_eps=1e-5,
                    merge_factor=0.0,
                    merge_strategy="learned",
                    switch_spatial_to_temporal_mix=True,
                )
            )
        attentions.append(
            Attention(
                query_dim=in_channels,
                heads=in_channels // attention_head_dim,
                dim_head=attention_head_dim,
                eps=1e-6,
                norm_num_groups=32,
                bias=True,
                residual_connection=True,
            )
        )
        self.attentions = nn.ModuleList(attentions)
        self.resnets = nn.ModuleList(resnets)

    def forward(self, hidden_states, image_only_indicator):
        hidden_states = self.resnets[0](hidden_states, image_only_indicator=image_only_indicator)
        for resnet, attn in zip(self.resnets[1:], self.attentions):
            hidden_states = attn(hidden_states)
            hidden_states = resnet(hidden_states, image_only_indicator=image_only_indicator)
        return hidden_states


class UpBlockTemporalDecoder(nn.Module):
    def __init__(self, in_channels: int, out_channels: int,
                 num_layers: int = 1, add_upsample: bool = True):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            input_channels = in_channels if i == 0 else out_channels
            resnets.append(
                SpatioTemporalResBlock(
                    in_channels=input_channels,
                    out_channels=out_channels,
                    temb_channels=None,
                    eps=1e-6,
                    temporal_eps=1e-5,
                    merge_factor=0.0,
                    merge_strategy="learned",
                    switch_spatial_to_temporal_mix=True,
                )
            )
        self.resnets = nn.ModuleList(resnets)
        if add_upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_channels, use_conv=True,
                                                        out_channels=out_channels)])
        else:
            self.upsamplers = None

    def forward(self, hidden_states, image_only_indicator):
        for resnet in self.resnets:
            hidden_states = resnet(hidden_states, image_only_indicator=image_only_indicator)
        if self.upsamplers is not None:
            for upsampler in self.upsamplers:
                hidden_states = upsampler(hidden_states)
        return hidden_states


class TemporalDecoder(nn.Module):
    def __init__(
        self,
        in_channels: int = 4,
        out_channels: int = 3,
        block_out_channels: Tuple[int, ...] = (128, 256, 512, 512),
        layers_per_block: int = 2,
    ):
        super().__init__()
        self.layers_per_block = layers_per_block
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[-1], kernel_size=3, stride=1, padding=1)
        self.mid_block = MidBlockTemporalDecoder(
            num_layers=self.layers_per_block,
            in_channels=block_out_channels[-1],
            out_channels=block_out_channels[-1],
            attention_head_dim=block_out_channels[-1],
        )
        self.up_blocks = nn.ModuleList([])
        reversed_block_out_channels = list(reversed(block_out_channels))
        output_channel = reversed_block_out_channels[0]
        for i in range(len(block_out_channels)):
            prev_output_channel = output_channel
            output_channel = reversed_block_out_channels[i]
            is_final_block = i == len(block_out_channels) - 1
            self.up_blocks.append(
                UpBlockTemporalDecoder(
                    num_layers=self.layers_per_block + 1,
                    in_channels=prev_output_channel,
                    out_channels=output_channel,
                    add_upsample=not is_final_block,
                )
            )
        self.conv_norm_out = nn.GroupNorm(num_channels=block_out_channels[0], num_groups=32, eps=1e-6)
        self.conv_act = nn.SiLU()
        self.conv_out = nn.Conv2d(block_out_channels[0], out_channels, kernel_size=3, padding=1)
        self.time_conv_out = nn.Conv3d(out_channels, out_channels,
                                       kernel_size=(3, 1, 1), padding=(1, 0, 0))

    def forward(self, sample, image_only_indicator, num_frames: int = 1):
        sample = self.conv_in(sample)
        sample = self.mid_block(sample, image_only_indicator=image_only_indicator)
        for up_block in self.up_blocks:
            sample = up_block(sample, image_only_indicator=image_only_indicator)
        sample = self.conv_norm_out(sample)
        sample = self.conv_act(sample)
        sample = self.conv_out(sample)

        batch_frames, channels, height, width = sample.shape
        batch_size = batch_frames // num_frames
        sample = sample[None, :].reshape(batch_size, num_frames, channels, height, width).permute(0, 2, 1, 3, 4)
        sample = self.time_conv_out(sample)
        sample = sample.permute(0, 2, 1, 3, 4).reshape(batch_frames, channels, height, width)
        return sample


class DiagonalGaussianDistribution:
    """vae.py DiagonalGaussianDistribution (mean/logvar halves, logvar
    clamped to [-30, 20])."""

    def __init__(self, parameters: torch.Tensor):
        self.parameters = parameters
        self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)
        self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
        self.std = torch.exp(0.5 * self.logvar)

    def mode(self):
        return self.mean

    def sample(self, generator=None):
        noise = torch.randn(self.mean.shape, generator=generator, dtype=self.mean.dtype)
        return self.mean + self.std * noise


class AutoencoderKLOutput:
    """encode() return wrapper (diffusers modeling_outputs.AutoencoderKLOutput):
    the pipeline reads ``vae.encode(x).latent_dist.mode()``."""

    def __init__(self, latent_dist: "DiagonalGaussianDistribution"):
        self.latent_dist = latent_dist


class AutoencoderKLTemporalDecoder(ModelMixin):
    """2D KL encoder + temporal decoder; quant_conv but NO post_quant_conv
    (decode consumes latents directly after the caller's /scaling_factor).

    ModelMixin + register_to_config so the reference pipeline can read
    ``vae.config.block_out_channels`` (pipeline...controlnet.py:142) and the
    parity gate can build it via ``from_config``."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        block_out_channels: Tuple[int, ...] = (64,),
        layers_per_block: int = 1,
        latent_channels: int = 4,
        scaling_factor: float = 0.18215,
    ):
        super().__init__()
        self.encoder = Encoder(
            in_channels=in_channels,
            out_channels=latent_channels,
            block_out_channels=block_out_channels,
            layers_per_block=layers_per_block,
        )
        self.decoder = TemporalDecoder(
            in_channels=latent_channels,
            out_channels=out_channels,
            block_out_channels=block_out_channels,
            layers_per_block=layers_per_block,
        )
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)

    def encode(self, x: torch.Tensor) -> "AutoencoderKLOutput":
        h = self.encoder(x)
        moments = self.quant_conv(h)
        return AutoencoderKLOutput(DiagonalGaussianDistribution(moments))

    def decode(self, z: torch.Tensor, num_frames: int) -> torch.Tensor:
        batch_size = z.shape[0] // num_frames
        image_only_indicator = torch.zeros(batch_size, num_frames, dtype=z.dtype, device=z.device)
        return self.decoder(z, num_frames=num_frames, image_only_indicator=image_only_indicator)
