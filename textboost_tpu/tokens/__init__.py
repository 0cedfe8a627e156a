from .surgery import (  # noqa: F401
    OBJECT_AUGMENTATIONS,
    STYLE_AUGMENTATIONS,
    TokenSurgeryResult,
    add_augmentation_tokens,
    add_token,
    concept_tokens_for_prompt,
    embedding_norm_stats,
    expand_placeholder,
)
