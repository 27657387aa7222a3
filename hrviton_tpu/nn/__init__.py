from hrviton_tpu.nn.layers import (BatchNorm2d, Conv2d, InstanceNorm2d,
                                   SpectralNorm2d, kaiming_normal_init,
                                   leaky_relu, normal_init, xavier_normal_init)

__all__ = [
    "BatchNorm2d", "Conv2d", "InstanceNorm2d", "SpectralNorm2d",
    "kaiming_normal_init", "leaky_relu", "normal_init", "xavier_normal_init",
]
