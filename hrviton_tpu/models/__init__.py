from hrviton_tpu.models.condition import ConditionGenerator, ResBlock
from hrviton_tpu.models.discriminators import (CondMultiscaleDiscriminator,
                                               CondNLayerDiscriminator,
                                               SPADEMultiscaleDiscriminator,
                                               SPADENLayerDiscriminator)
from hrviton_tpu.models.spade import (MaskNorm, SPADEGenerator, SPADENorm,
                                      SPADEResBlock)

__all__ = [
    "ConditionGenerator", "ResBlock",
    "CondMultiscaleDiscriminator", "CondNLayerDiscriminator",
    "SPADEMultiscaleDiscriminator", "SPADENLayerDiscriminator",
    "MaskNorm", "SPADEGenerator", "SPADENorm", "SPADEResBlock",
]
