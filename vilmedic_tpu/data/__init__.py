from . import processing  # noqa: F401  (registers cleaners)
from .anyfield import AnyDataset  # noqa: F401
from .composites import ImLabel, ImSeq, ImSeq2Seq, ImSeqAny, ImSeqLabel, Seq2Seq  # noqa: F401
from .image import ImageDataset, vilmedic_collate  # noqa: F401
from .label import LabelDataset  # noqa: F401
from .loader import DataLoader  # noqa: F401
from .text import TextDataset  # noqa: F401
