from .text_to_image import TextToImagePipeline  # noqa: F401
