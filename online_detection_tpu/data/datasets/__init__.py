"""Dataset readers (iCWT XML / YCB-Video BOP) and the harvest-GT dispatch."""


def harvest_annotation(dataset, index):
    """GT annotation as the reference's engine-side parser builds it for the
    boxes fed to the MODEL (harvesting and the eval-segm-with-GT-boxes
    substitution): ``compute_gts_icwt`` / ``compute_gts_ycbv``
    (``feature_proposal_extractor.py:115-231``, ``engine/inference.py:
    143-263``). For XML datasets this differs from the evaluator's GT by an
    unconditional -1 shift and the absence of difficult-filtering — see
    ``ICubWorldDataset.harvest_annotation``. Falls back to
    ``get_annotation`` for datasets without a dedicated harvest parser
    (synthetic test datasets, cached-feature wrappers)."""
    fn = getattr(dataset, "harvest_annotation", None)
    return fn(index) if fn is not None else dataset.get_annotation(index)
