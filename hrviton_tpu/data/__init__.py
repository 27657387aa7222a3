from hrviton_tpu.data.agnostic import build_cloth_agnostic, build_parse_agnostic
from hrviton_tpu.data.dataset import VitonHDDataset
from hrviton_tpu.data.device import expand_compact
from hrviton_tpu.data.loader import Loader, collate
from hrviton_tpu.data.synthetic import make_synthetic_dataset

__all__ = ["build_cloth_agnostic", "build_parse_agnostic", "VitonHDDataset",
           "Loader", "collate", "make_synthetic_dataset", "expand_compact"]
