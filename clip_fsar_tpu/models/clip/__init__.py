from clip_fsar_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize

__all__ = ["SimpleTokenizer", "tokenize"]
