from .augment import REFERENCE_CAPTION_MAP, PairedAugmentation  # noqa: F401
from .datasets import (  # noqa: F401
    FolderDataset,
    InstructPix2PixDataset,
    PriorDataset,
    PromptDataset,
    TextBoostDataset,
)
from .loader import PrefetchLoader  # noqa: F401
from .sharding import ShardedIndexIterator, process_shard_info  # noqa: F401
from .templates import (  # noqa: F401
    TEMPLATE_BANKS,
    imagenet_style_templates_small,
    imagenet_templates_small,
    resolve_template,
    textboost_templates,
)
from .tokenizer import (  # noqa: F401
    BASE_VOCAB,
    BOS_ID,
    EOS_ID,
    HashTokenizer,
    load_tokenizer,
    tokenize_prompt,
)
