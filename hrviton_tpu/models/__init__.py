from hrviton_tpu.models.condition import ConditionGenerator, ResBlock
from hrviton_tpu.models.discriminators import (CondMultiscaleDiscriminator,
                                               CondNLayerDiscriminator,
                                               SPADEMultiscaleDiscriminator,
                                               SPADENLayerDiscriminator)
from hrviton_tpu.models.backbones import (AlexNetFeatures, SqueezeNetFeatures,
                                          Vgg16Features, Vgg19Features)
from hrviton_tpu.models.inception import InceptionV3, convert_inception_v3
from hrviton_tpu.models.spade import (MaskNorm, SPADEGenerator, SPADENorm,
                                      SPADEResBlock)

__all__ = [
    "ConditionGenerator", "ResBlock",
    "CondMultiscaleDiscriminator", "CondNLayerDiscriminator",
    "SPADEMultiscaleDiscriminator", "SPADENLayerDiscriminator",
    "MaskNorm", "SPADEGenerator", "SPADENorm", "SPADEResBlock",
    "AlexNetFeatures", "SqueezeNetFeatures", "Vgg16Features", "Vgg19Features",
    "InceptionV3", "convert_inception_v3",
]
