"""Pure extraction kernel — deterministic, Spark-free.

The kernel is the single implementation of the extraction semantics; both the
single-threaded oracle (``ocr_spark.oracle``) and the Arrow-batched Spark UDF
(``ocr_spark.pipeline``) call the same functions, so per-turn parity is by
construction and divergence is caught by the pytest suite.

Semantics carried over from the reference (citations into /root/reference):
- main-content vs boilerplate segmentation  -> ``html_extract``
  (Ingredients_OCR.py:38-71 block accumulation state machine, generalized to
  tag-tree + text/link-density scoring a la Boilerpipe)
- footer/boilerplate truncation             -> ``cleanup`` step 4
  (NFT_OCR.py:708-721 drop_below_term, phrase list :792-795)
- ordered token cleanup chain               -> ``cleanup``
  (NFT_OCR.py:787-809 clean_up_ocr fixed op order)
- reading-order layout parse                -> ``layout_extract``
  (NFT_OCR.py:45-82 same-line grouping, :80-82 distance sort,
  :1039-1058 split_into_lines)
- field extraction + conflict merge + absence -> ``fields``
  (NFT_OCR.py:1197-1241 extract_units_and_quantities, :1163-1183 add_to_dict,
  :1360-1395 determine_absent_ingredients)
"""

from ocr_spark.kernel.extract import extract_batch, extract_turn  # noqa: F401
