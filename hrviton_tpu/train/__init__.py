from hrviton_tpu.train.checkpoint import (convert_alexnet,
                                          convert_cond_discriminator,
                                          convert_lpips_alex, convert_spade_gen,
                                          convert_tocg, convert_vgg19,
                                          load_pytree, load_torch_state_dict,
                                          restore_into, save_pytree)
from hrviton_tpu.train.condition_trainer import ConditionTrainer
from hrviton_tpu.train.generator_trainer import GeneratorTrainer
from hrviton_tpu.train.optim import adam, lambda_decay_schedule
from hrviton_tpu.train.state import GANState, NetState

__all__ = [
    "convert_alexnet", "convert_cond_discriminator", "convert_lpips_alex",
    "convert_spade_gen", "convert_tocg", "convert_vgg19",
    "load_pytree", "load_torch_state_dict", "restore_into", "save_pytree",
    "ConditionTrainer", "GeneratorTrainer",
    "adam", "lambda_decay_schedule", "GANState", "NetState",
]
