"""Column-level function library: webhook crypto lives in sources/,
multimodal binary plumbing and the BPE tokenizer trainer (``bpe``) here;
text/dedup/similarity expressions live with their query plans in
plans/."""
