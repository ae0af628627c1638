#!/usr/bin/env python
"""Convert a reference ViLMedic ``.pth`` checkpoint into a native ``.ckpt``.

Usage:
  python bin_tpu/convert_checkpoint.py model.pth out_dir/ \
      --num-layers 1 --backbone densenet169

Loads the torch checkpoint (``{"model": state_dict, "config": ...}``,
reference trainor.py:194-203), converts the BertGeneration decoder and the
torchvision vision tower into the native Flax layout (zoo/convert.py), and
writes a msgpack checkpoint that ``AutoModel.from_pretrained`` can load.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("pth")
    parser.add_argument("out_dir")
    parser.add_argument("--num-layers", type=int, required=True,
                        help="decoder num_hidden_layers")
    parser.add_argument("--backbone", default="densenet169")
    parser.add_argument("--tag", default="0.0")
    parser.add_argument("--epoch", type=int, default=0)
    parser.add_argument("--seed", default="000000")
    args = parser.parse_args(argv)

    import torch

    from vilmedic_tpu.executors.checkpoint import save_checkpoint
    from vilmedic_tpu.zoo.convert import convert_reference_rrg

    state = torch.load(args.pth, map_location="cpu", weights_only=False)
    model_state = {k: v.numpy() for k, v in state["model"].items()}
    # strip DataParallel prefixes (reference executors/utils.py:26-34)
    model_state = {k.replace("module.", ""): v for k, v in model_state.items()}

    variables = convert_reference_rrg(
        model_state, num_layers=args.num_layers, backbone=args.backbone
    )

    os.makedirs(args.out_dir, exist_ok=True)
    config = state.get("config")
    if config is not None and not isinstance(config, dict):
        try:
            from omegaconf import OmegaConf

            config = OmegaConf.to_container(config)
        except Exception:
            config = {}
    path = os.path.join(args.out_dir, f"{args.tag}_{args.epoch}_{args.seed}.ckpt")
    save_checkpoint(path, {
        "model": variables,
        "opt_state": None,
        "training_scheduler": {},
        "config": config or {},
        "__version__": state.get("__version__", "reference"),
    })
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
