"""CLI front-ends preserving the reference's script names and flags:

  python -m hrviton_tpu.cli.train_condition  <-> train_condition.py
  python -m hrviton_tpu.cli.train_generator  <-> train_generator.py
  python -m hrviton_tpu.cli.test_generator   <-> test_generator.py
  python -m hrviton_tpu.cli.test_condition   <-> test_condition.py
  python -m hrviton_tpu.cli.get_norm_const   <-> get_norm_const.py
  python -m hrviton_tpu.cli.evaluate         <-> evaluate.py
  python -m hrviton_tpu.cli.get_parse_agnostic <-> get_parse_agnostic.py
  python -m hrviton_tpu.cli.convert_checkpoint  (new: .pth -> .ckpt)
"""
