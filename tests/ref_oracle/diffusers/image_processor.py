"""VaeImageProcessor stand-in (diffusers 0.24.0 image_processor.py) — the
subset the reference pipeline exercises (pipeline...controlnet.py:143-150,
449-503, 590): PIL/np/pt ingestion, [0,1]->[-1,1] normalize, NCHW layout, and
the postprocess inverse. The parity gate always feeds inputs already at the
target resolution, so the resize path only needs the same-size fast path
(asserted) — none of diffusers' resampling numerics are re-implemented here.
"""

import numpy as np
import torch


class VaeImageProcessor:
    def __init__(self, vae_scale_factor: int = 8, do_resize: bool = True,
                 do_normalize: bool = True):
        self.vae_scale_factor = vae_scale_factor
        self.do_resize = do_resize
        self.do_normalize = do_normalize

    @staticmethod
    def pil_to_numpy(images):
        if not isinstance(images, list):
            images = [images]
        arr = [np.array(im).astype(np.float32) / 255.0 for im in images]
        return np.stack(arr, axis=0)

    @staticmethod
    def numpy_to_pt(images: np.ndarray) -> torch.Tensor:
        if images.ndim == 3:
            images = images[..., None]
        return torch.from_numpy(images.transpose(0, 3, 1, 2)).contiguous()

    @staticmethod
    def pt_to_numpy(images: torch.Tensor) -> np.ndarray:
        return images.cpu().permute(0, 2, 3, 1).float().numpy()

    @staticmethod
    def numpy_to_pil(images: np.ndarray):
        from PIL import Image

        if images.ndim == 3:
            images = images[None, ...]
        images = (images * 255).round().astype("uint8")
        return [Image.fromarray(im) for im in images]

    @staticmethod
    def denormalize(images):
        return (images / 2 + 0.5).clamp(0, 1)

    def preprocess(self, image, height=None, width=None):
        """PIL (list) / np [0,1] / pt [0,1] -> normalized NCHW tensor.

        Stand-in restriction: inputs must already be (height, width) — the
        oracle gate feeds exact-size frames, so no resampling is emulated.
        """
        if isinstance(image, torch.Tensor):
            pt = image if image.ndim == 4 else image[None]
        else:
            try:
                import PIL.Image

                if isinstance(image, PIL.Image.Image):
                    image = [image]
                if isinstance(image, list) and image and isinstance(image[0], PIL.Image.Image):
                    image = self.pil_to_numpy(image)
            except ImportError:
                pass
            arr = np.asarray(image, dtype=np.float32)
            if arr.ndim == 3:
                arr = arr[None]
            pt = self.numpy_to_pt(arr)
        if height is not None and width is not None:
            if pt.shape[-2:] != (height, width):
                raise NotImplementedError(
                    "test-only VaeImageProcessor stand-in does not resample; "
                    f"got {tuple(pt.shape[-2:])}, want {(height, width)}"
                )
        if self.do_normalize:
            pt = 2.0 * pt - 1.0
        return pt

    def postprocess(self, image: torch.Tensor, output_type: str = "pil"):
        image = self.denormalize(image)
        if output_type == "pt":
            return image
        image = self.pt_to_numpy(image)
        if output_type == "np":
            return image
        return self.numpy_to_pil(image)
