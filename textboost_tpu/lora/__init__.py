from .partition import (  # noqa: F401
    added_embedding_norm,
    apply_mixing_mask,
    clip_encoder_grads,
    count_params,
    lr_schedule,
    make_optimizer,
    param_labels,
    renorm_added_embeddings,
    trainable_mask,
    zero_frozen_grads,
    zero_original_vocab_rows,
)
from .peft_io import (  # noqa: F401
    export_lora_adapter,
    export_token_embeddings,
    export_unet_lora_adapter,
    import_lora_adapter,
    import_token_embeddings,
    import_unet_lora_adapter,
    token_bin_filename,
)
