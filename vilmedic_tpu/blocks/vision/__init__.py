from .densenet import DenseNet, make_densenet, output_channels  # noqa: F401
from .resnet import ResNet, make_resnet  # noqa: F401
from .visual_encoder import VisualEncoder, build_visual_encoder  # noqa: F401
from .vit import ViT, make_vit  # noqa: F401
