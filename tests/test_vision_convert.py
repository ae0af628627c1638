"""Vision converter: torch conv/BN numeric equivalence + full-tree structure."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import flax.linen as nn

from vilmedic_tpu.zoo.convert_vision import bn, conv_kernel, convert_densenet, convert_resnet


def test_conv_weight_transpose_matches_torch():
    """A converted torch Conv2d must reproduce torch outputs in flax."""
    tconv = torch.nn.Conv2d(3, 8, kernel_size=3, stride=2, padding=1, bias=False)
    x = np.random.default_rng(0).normal(size=(2, 12, 12, 3)).astype(np.float32)

    with torch.no_grad():
        expected = tconv(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    fconv = nn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], use_bias=False)
    params = {"kernel": jnp.asarray(conv_kernel(tconv.weight.detach().numpy()))}
    got = fconv.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


def test_batchnorm_matches_torch_eval():
    tbn = torch.nn.BatchNorm2d(6)
    with torch.no_grad():
        tbn.running_mean.normal_()
        tbn.running_var.uniform_(0.5, 2.0)
        tbn.weight.normal_()
        tbn.bias.normal_()
    tbn.eval()
    x = np.random.default_rng(1).normal(size=(2, 5, 5, 6)).astype(np.float32)
    with torch.no_grad():
        expected = tbn(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    sd = {f"b.{k}": v.detach().numpy() for k, v in tbn.state_dict().items()}
    p, s = bn(sd, "b")
    fbn = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    got = fbn.apply(
        {"params": p, "batch_stats": s}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


def test_densenet_tree_structure():
    """Converted tree must exactly match the flax densenet121 param structure."""
    from vilmedic_tpu.blocks.vision.densenet import make_densenet

    model = make_densenet("densenet121", "features")
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 3))), jax.random.key(0)
    )
    params_shape = variables["params"]
    stats_shape = variables["batch_stats"]

    # synthesize a torch state dict with shapes derived from the flax tree
    sd = {}

    def put_conv(torch_name, flax_kernel):
        kh, kw, i, o = flax_kernel.shape
        sd[torch_name] = np.zeros((o, i, kh, kw), np.float32)

    def put_bn(torch_prefix, flax_scale):
        c = flax_scale.shape[0]
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{torch_prefix}.{suffix}"] = np.zeros((c,), np.float32)

    put_conv("features.conv0.weight", params_shape["conv0"]["kernel"])
    put_bn("features.norm0", params_shape["norm0"]["scale"])
    from vilmedic_tpu.blocks.vision.densenet import CONFIGS

    _, blocks, _ = CONFIGS["densenet121"]
    for bi, n_layers in enumerate(blocks):
        for li in range(n_layers):
            fl = params_shape[f"block{bi}_layer{li}"]
            t = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            put_bn(f"{t}.norm1", fl["BatchNorm_0"]["scale"])
            put_conv(f"{t}.conv1.weight", fl["Conv_0"]["kernel"])
            put_bn(f"{t}.norm2", fl["BatchNorm_1"]["scale"])
            put_conv(f"{t}.conv2.weight", fl["Conv_1"]["kernel"])
        if bi < len(blocks) - 1:
            t = f"features.transition{bi + 1}"
            put_bn(f"{t}.norm", params_shape[f"transition{bi}_norm"]["scale"])
            put_conv(f"{t}.conv.weight", params_shape[f"transition{bi}_conv"]["kernel"])
    put_bn("features.norm5", params_shape["norm_final"]["scale"])

    params, stats = convert_densenet(sd, "densenet121")

    def shapes(tree):
        return jax.tree.map(lambda x: tuple(x.shape), tree)

    assert shapes(params) == shapes(params_shape)
    assert shapes(stats) == shapes(stats_shape)


def test_resnet_tree_structure():
    from vilmedic_tpu.blocks.vision.resnet import make_resnet

    model = make_resnet("resnet18", "layer4")
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 3))), jax.random.key(0)
    )
    params_shape = variables["params"]
    stats_shape = variables["batch_stats"]

    sd = {}

    def put_conv(torch_name, flax_kernel):
        kh, kw, i, o = flax_kernel.shape
        sd[torch_name] = np.zeros((o, i, kh, kw), np.float32)

    def put_bn(torch_prefix, flax_scale):
        c = flax_scale.shape[0]
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{torch_prefix}.{suffix}"] = np.zeros((c,), np.float32)

    put_conv("conv1.weight", params_shape["conv_init"]["kernel"])
    put_bn("bn1", params_shape["bn_init"]["scale"])
    from vilmedic_tpu.blocks.vision.resnet import STAGE_SIZES

    sizes, _ = STAGE_SIZES["resnet18"]
    for si, n_blocks in enumerate(sizes):
        for bi in range(n_blocks):
            fl = params_shape[f"layer{si + 1}_block{bi}"]
            t = f"layer{si + 1}.{bi}"
            for ci in range(2):
                put_conv(f"{t}.conv{ci + 1}.weight", fl[f"Conv_{ci}"]["kernel"])
                put_bn(f"{t}.bn{ci + 1}", fl[f"BatchNorm_{ci}"]["scale"])
            if "conv_proj" in fl:
                put_conv(f"{t}.downsample.0.weight", fl["conv_proj"]["kernel"])
                put_bn(f"{t}.downsample.1", fl["norm_proj"]["scale"])

    params, stats = convert_resnet(sd, "resnet18")

    def shapes(tree):
        return jax.tree.map(lambda x: tuple(x.shape), tree)

    assert shapes(params) == shapes(params_shape)
    assert shapes(stats) == shapes(stats_shape)
