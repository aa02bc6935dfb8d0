"""Benchmark drivers: MJ-BENCH-VIDEO preference/aspect eval, SafeSora,
GenAI-Bench.

Replaces the MJ-Video-side eval scripts (``eval_genai_mjvideo.py``, the
``CustomTrainer.evaluate``/``evaluate_aspect`` overrides in
``overall_train.py:204-442``) and the SafeSora pair filter
(``eval_safesora_internvl2_2b.py:95-108``).  Results persist incrementally
to JSONL (evals are long and crash-prone — SURVEY.md §5 observability row).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Iterable, List, Optional

import numpy as np

from ..configs import ASPECT_NAMES, CRITERIA_NAMES
from .metrics import binary_dimension_metrics, genai_bench_metrics, preference_accuracy
from .scorer import RewardScorer


def iter_jsonl(path: str):
    """Parsed records of a results JSONL, skipping torn lines.

    A crashed prior run can leave a truncated final line; the writer's
    resume path already tolerates it (the item is simply re-scored), so
    every reader of these files must tolerate it too — an unguarded
    json.loads at the merge step would throw away a finished run at its
    very last step."""
    with open(path) as f:
        for line in f:
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                pass


class IncrementalWriter:
    """Append-only JSONL results with resume support.

    ``records`` holds the prior runs' parsed rows by id so drivers can
    reuse stored scores for seen items (the labels side of a metric is
    recomputed from the dataset, which is cheap — only decode+score is
    worth skipping)."""

    def __init__(self, path: Optional[str]):
        self.path = path
        self.done = set()
        self.records: Dict = {}
        if path and os.path.exists(path):
            for r in iter_jsonl(path):
                self.done.add(r.get("id"))
                self.records[r.get("id")] = r
            # A crash mid-write leaves a torn final line WITHOUT a newline;
            # appending the re-scored record to it would glue valid JSON
            # onto the torn fragment and corrupt that record too.
            # Terminate the fragment so subsequent appends start clean
            # (iter_jsonl then skips the fragment as its own torn line).
            with open(path, "rb+") as f:
                f.seek(0, os.SEEK_END)
                if f.tell() > 0:
                    f.seek(-1, os.SEEK_END)
                    if f.read(1) != b"\n":
                        f.write(b"\n")

    def seen(self, item_id) -> bool:
        return item_id in self.done

    def write(self, record: Dict) -> None:
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record, default=float) + "\n")
        self.done.add(record.get("id"))


def _pair_pixels(p0, p1):
    """One concatenated pixel batch when the clips' arrays stack, else
    the pair as-is — under ``device_preprocess`` the scorer receives raw
    source-resolution frames, and a preference pair from two different
    generators can disagree on shape."""
    if p0.shape[1:] == p1.shape[1:]:
        return np.concatenate([p0, p1], axis=0)
    return (p0, p1)


def _score_pair(scorer: RewardScorer, pixels, ids, gpos) -> "RewardOutput":
    """score_batch over a pair, scoring each clip separately when the
    raw-frame shapes differ (each then gets its own device grid)."""
    if not isinstance(pixels, tuple):
        return scorer.score_batch(pixels, ids, gpos)
    outs = [scorer.score_batch(p, ids[v:v + 1], list(gpos)[v:v + 1])
            for v, p in enumerate(pixels)]
    return type(outs[0])(*(np.concatenate(
        [np.asarray(f) for f in fields]) for fields in zip(*outs)))


def evaluate_preference(
    scorer: RewardScorer,
    records: Iterable[Dict],
    root: str = "",
    num_segments: int = 8,
    max_num: int = 1,
    results_path: Optional[str] = None,
) -> Dict[str, float]:
    """Pairwise overall-preference accuracy over MJ-BENCH-VIDEO-style records
    (``overall_train.py:390-442`` semantics, incl. tie masking)."""
    from ..data.labels import deal_preference

    from ..data.dataset import prefetch

    writer = IncrementalWriter(results_path)

    def prepared():
        """Host-side decode+tokenize, pipelined ahead of device compute."""
        for i, item in enumerate(records):
            if writer.seen(i):
                continue
            pref, mask = deal_preference(item["overall_preference"],
                                         overall=True)
            p0, i0, g0 = scorer.prepare_clip(
                os.path.join(root, item["video_0_path"]), item["caption"],
                num_segments=num_segments, max_num=max_num,
            )
            p1, i1, g1 = scorer.prepare_clip(
                os.path.join(root, item["video_1_path"]), item["caption"],
                num_segments=num_segments, max_num=max_num,
            )
            yield (i, pref[0], mask[0],
                   _pair_pixels(p0, p1), [i0, i1], [g0, g1])

    s0s, s1s, prefs, masks = [], [], [], []
    for i, pref, mask, pixels, ids, gpos in prefetch(prepared(), 2):
        out = _score_pair(scorer, pixels, ids, gpos)
        scores = np.asarray(out.score, np.float32)
        rec = {
            "id": i,
            "score_0": float(scores[0]),
            "score_1": float(scores[1]),
            "preference": pref,
            "mask": mask,
        }
        writer.write(rec)
        s0s.append(rec["score_0"])
        s1s.append(rec["score_1"])
        prefs.append(pref)
        masks.append(mask)
    # merge resumed results
    if results_path and os.path.exists(results_path):
        s0s, s1s, prefs, masks = [], [], [], []
        for r in iter_jsonl(results_path):
            s0s.append(r["score_0"])
            s1s.append(r["score_1"])
            prefs.append(r["preference"])
            masks.append(r["mask"])
    res = preference_accuracy(
        np.asarray(s0s), np.asarray(s1s), np.asarray(prefs), np.asarray(masks)
    )
    from .metrics import strict_and_tie_aware

    sta = strict_and_tie_aware(np.asarray(s0s), np.asarray(s1s),
                               np.asarray(prefs), np.asarray(masks))
    res.update(strict=sta["strict"], tie_aware=sta["tie_aware"],
               ties=sta["ties"])
    return res


def evaluate_aspects(
    scorer: RewardScorer,
    records: Iterable[Dict],
    root: str = "",
    num_segments: int = 8,
    max_num: int = 1,
    results_path: Optional[str] = None,
) -> Dict[str, List[Dict]]:
    """Per-criteria and per-aspect binary metrics over both videos of each
    pair (``overall_train.py:204-306`` / ``criteria_train.py:107-316``)."""
    from ..data.dataset import prefetch
    from ..data.labels import pair_record_labels

    writer = IncrementalWriter(results_path)
    crit_scores, crit_gt, crit_rel = [], [], []
    asp_scores, asp_gt, asp_rel = [], [], []
    asp0, asp1, apref, amask = [], [], [], []

    def prepared():
        for i, item in enumerate(records):
            labels = pair_record_labels(item)
            if writer.seen(i):
                # resume: reuse the stored scores; labels recompute from
                # the dataset (cheap) — only decode+score is skipped
                yield (i, labels, None, None, None)
                continue
            p0, i0, g0 = scorer.prepare_clip(
                os.path.join(root, item["video_0_path"]), item["caption"],
                num_segments=num_segments, max_num=max_num,
            )
            p1, i1, g1 = scorer.prepare_clip(
                os.path.join(root, item["video_1_path"]), item["caption"],
                num_segments=num_segments, max_num=max_num,
            )
            yield (i, labels,
                   _pair_pixels(p0, p1), [i0, i1], [g0, g1])

    for i, labels, pixels, ids, gpos in prefetch(prepared(), 2):
        if pixels is None:
            stored = writer.records[i]
            r0, r1 = (
                {"rewards": np.asarray(stored[f"rewards_{b}"], np.float32),
                 "aspect_scores": np.asarray(stored[f"aspects_{b}"],
                                             np.float32)}
                for b in (0, 1)
            )
        else:
            out = _score_pair(scorer, pixels, ids, gpos)
            r0, r1 = (
                {"rewards": np.asarray(out.rewards, np.float32)[b],
                 "aspect_scores": np.asarray(out.aspect_scores,
                                             np.float32)[b]}
                for b in (0, 1)
            )
        for v, r in ((0, r0), (1, r1)):
            crit_scores.append(r["rewards"])
            crit_gt.append(labels[f"video_{v}_criteria_score"])
            crit_rel.append(labels[f"video_{v}_criteria_related"])
            asp_scores.append(r["aspect_scores"])
            asp_gt.append(labels[f"video_{v}_aspect_score"])
            asp_rel.append(labels[f"video_{v}_aspect_related"])
        asp0.append(r0["aspect_scores"])
        asp1.append(r1["aspect_scores"])
        apref.append(labels["aspect_preference"])
        amask.append(labels["aspect_mask"])
        if pixels is not None:  # resumed items are already persisted
            writer.write({
                "id": i,
                "rewards_0": r0["rewards"].tolist(),
                "rewards_1": r1["rewards"].tolist(),
                "aspects_0": r0["aspect_scores"].tolist(),
                "aspects_1": r1["aspect_scores"].tolist(),
            })
    if not crit_scores:  # empty records (e.g. everything filtered out)
        return {"criteria": [], "aspects": [], "aspect_preference": []}
    from .metrics import strict_and_tie_aware

    # Per-aspect pairwise preference (the leaderboard's per-aspect
    # "(strict)" columns, README.md:150-161 MJ-VIDEO row): compare the two
    # videos' aspect scores against the per-aspect preference labels.
    a0, a1 = np.stack(asp0), np.stack(asp1)
    ap, am = np.stack(apref), np.stack(amask)
    aspect_pref_rows = []
    for d, name in enumerate(ASPECT_NAMES):
        sta = strict_and_tie_aware(a0[:, d], a1[:, d], ap[:, d], am[:, d])
        aspect_pref_rows.append({"name": name, **sta})
    return {
        "criteria": binary_dimension_metrics(
            np.stack(crit_scores), np.stack(crit_gt), np.stack(crit_rel),
            names=CRITERIA_NAMES,
        ),
        "aspects": binary_dimension_metrics(
            np.stack(asp_scores), np.stack(asp_gt), np.stack(asp_rel),
            names=ASPECT_NAMES,
        ),
        "aspect_preference": aspect_pref_rows,
    }


def genai_driver(
    pair_scorer: Callable[[str, str, str], Dict],
    examples: Iterable[Dict],
    results_path: Optional[str] = None,
    fetch: Optional[Callable[[str], str]] = None,
):
    """Shared GenAI-Bench driver loop (reward scorer AND baseline judges):
    enumerate examples, skip already-persisted ids, fetch videos, score the
    pair via ``pair_scorer(left, right, prompt) -> record`` (must contain
    ``score_left``/``score_right``), persist incrementally, and on resume
    re-read the file so the returned arrays cover the union of runs.

    Returns (score_left array, score_right array, vote_types list).
    """
    writer = IncrementalWriter(results_path)
    lefts, rights, votes = [], [], []
    for i, ex in enumerate(examples):
        if writer.seen(i):
            continue
        left = fetch(ex["left_video"]) if fetch else ex["left_video"]
        right = fetch(ex["right_video"]) if fetch else ex["right_video"]
        rec = dict(pair_scorer(left, right, ex["prompt"]))
        rec["id"] = i
        rec["vote_type"] = ex["vote_type"]
        writer.write(rec)
        lefts.append(rec["score_left"])
        rights.append(rec["score_right"])
        votes.append(rec["vote_type"])
    # merge resumed results (the re-read supersedes the in-memory lists so a
    # resumed run scores the union; with results_path=None the in-memory
    # accumulation above is the result)
    if results_path and os.path.exists(results_path):
        lefts, rights, votes = [], [], []
        for r in iter_jsonl(results_path):
            lefts.append(r["score_left"])
            rights.append(r["score_right"])
            votes.append(r["vote_type"])
    return (np.asarray(lefts, np.float64), np.asarray(rights, np.float64),
            votes)


def evaluate_genai_bench(
    scorer: RewardScorer,
    examples: Iterable[Dict],
    num_segments: int = 8,
    max_num: int = 1,
    results_path: Optional[str] = None,
    fetch: Optional[Callable[[str], str]] = None,
) -> Dict[str, float]:
    """GenAI-Bench video_generation eval (``eval_genai_mjvideo.py:119-165``).

    ``examples`` yield {left_video, right_video, prompt, vote_type}; ``fetch``
    maps remote paths to local files (e.g. ``data.video.fetch_remote_video``).
    """
    def pair_scorer(left, right, prompt):
        rl, rr = scorer.score_pair(left, right, prompt,
                                   num_segments=num_segments, max_num=max_num)
        return {"score_left": float(rl["score"]),
                "score_right": float(rr["score"])}

    lefts, rights, votes = genai_driver(pair_scorer, examples,
                                        results_path=results_path,
                                        fetch=fetch)
    return genai_bench_metrics(lefts, rights, votes)


def filter_safesora_pairs(records: Iterable[Dict]) -> List[Dict]:
    """SafeSora-test filter + schema conversion.

    Keeps pairs where helpfulness == harmlessness == every sub-preference,
    unanimously (``eval_safesora_internvl2_2b.py:95-108``), and converts the
    SafeSora record shape (``prompt_text``, ``video_{0,1}.video_path``,
    preference values 'video_0'/'video_1') into this framework's pair-record
    schema so the standard drivers run unchanged.
    """
    out = []
    for r in records:
        prefs = r.get("sub_preferences", {})
        h = r.get("helpfulness")
        harm = r.get("harmlessness")
        if h is None or harm is None or h != harm:
            continue
        if not all(v == h for v in prefs.values()):
            continue
        out.append({
            "caption": r["prompt_text"],
            "video_0_path": r["video_0"]["video_path"],
            "video_1_path": r["video_1"]["video_path"],
            "overall_preference": (
                "Video 1 better" if h == "video_0" else "Video 2 better"
            ),
        })
    return out
