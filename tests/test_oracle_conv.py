"""Image-conditioned torch oracle: trains and stays finite."""

import numpy as np
import torch

from oracle.torch_oracle import TorchImageNDivGAN


def test_image_oracle_trains():
    torch.manual_seed(0)
    gan = TorchImageNDivGAN(image_size=16, embed_dim=16, traj_dim=32,
                            hidden=(32,), seed=0)
    images = torch.rand(4, 16, 16, 3)
    real = torch.rand(4, 32)
    losses = [gan.train_step_images(images, real, k=4) for _ in range(3)]
    for row in losses:
        for k, v in row.items():
            assert np.isfinite(v), k


def test_conv_encoder_gradients_flow():
    gan = TorchImageNDivGAN(image_size=16, embed_dim=16, traj_dim=32,
                            hidden=(32,), seed=1)
    w0 = gan.g_encoder.head.weight.detach().clone()
    images = torch.rand(4, 16, 16, 3)
    real = torch.rand(4, 32)
    for _ in range(2):
        gan.train_step_images(images, real, k=4)
    assert not torch.allclose(w0, gan.g_encoder.head.weight)
