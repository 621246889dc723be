"""PDF layout grouping: text runs -> lines -> paragraphs -> ordered page.

Semantics parity (reference citations, behavior only — new implementation):
- group_blocks_in_lines (sweep in object order; new line when no y-overlap
  with the current group; sub/superscript markers; space insertion at x-gap
  > h*0.35): /root/reference/utils/text/parsers/pdf_parser.py:180-266
- group_lines_in_paragraphs (break on font-size delta > 1, vertical gap >
  h*0.8, indentation > 0.008 with uppercase start, footnotes; ' \n' join;
  soft-hyphen continuation): pdf_parser.py:268-346
- per-page post-processing (median font size -> footnote flag; header if
  y0 <= header_threshold single-line; trailing digit page-number; final
  order weight header(0) < body(1) < footnote(2) < page-number(3)):
  pdf_parser.py:140-170,361-369

Blocks are dicts {'text': str, 'box': [x0,y0,x1,y1] relative top-left,
'font_size': float} in object order (pdf_parser.py:103-108 normalization).
"""

from __future__ import annotations

import numpy as np

from .boxes import compute_union


def _overlap_y(box1, box2) -> bool:
    return min(box1[3], box2[3]) - max(box1[1], box2[1]) > 0


def group_blocks_in_lines(blocks, *, factor=0.6, space_threshold=0.35):
    """pdf_parser.py:180-266 semantics."""
    if not blocks:
        return []
    boxes = np.array([b["box"] for b in blocks], dtype=np.float64)

    groups, group, group_indexes = [], [blocks[0]], [0]
    for i, block in enumerate(blocks[1:], start=1):
        if group and not any(_overlap_y(block["box"], g["box"]) for g in group):
            groups.append((group, boxes[group_indexes]))
            group, group_indexes = [], []
        group.append(block)
        group_indexes.append(i)
    if group:
        groups.append((group, boxes[group_indexes]))

    lines = []
    for group, group_boxes in groups:
        if len(group) == 1:
            lines.append(dict(group[0]))
            continue

        is_text = [any(c.isalnum() for c in block["text"]) for block in group]
        text_boxes = group_boxes[is_text]
        if len(text_boxes) == 0:
            text_boxes = group_boxes

        group_h = np.mean(text_boxes[:, 3] - text_boxes[:, 1])
        exp_threshold = np.median(text_boxes[:, 1]) + group_h * factor
        ind_threshold = np.median(text_boxes[:, 1]) + group_h * (1 - factor)

        text, infos, prev_box, last_is_special = "", {}, None, False
        for block, box in zip(group, group_boxes):
            txt = block["text"]
            if txt[0].isalnum():
                if box[1] >= ind_threshold and " " not in txt:
                    # subscript index, e.g. c_i (pdf_parser.py:217-223)
                    text += "_"
                    last_is_special = True
                elif box[3] <= exp_threshold and " " not in txt:
                    # superscript: exponent or footnote ref (pdf_parser.py:224-241)
                    if text.endswith(txt) and txt[-1].isdigit():
                        txt = "".join(c for c in txt if c.isdigit())
                        text = text[: -len(txt)]
                    if not text:
                        infos.update({"is_footnote": True, "footnote_index": txt})
                    else:
                        infos.setdefault("footnotes", []).append(txt)
                    text += "^"
                    last_is_special = True
                elif prev_box is not None and (
                    last_is_special
                    or not text[-1].isalnum()
                    or abs(box[0] - prev_box[2]) > (prev_box[3] - prev_box[1]) * space_threshold
                ):
                    text += " "
                    last_is_special = False
                else:
                    last_is_special = False
            elif txt[0] not in (".", ",", ")"):
                text += " "

            text += txt
            prev_box = box

        lines.append(
            {
                "text": text,
                "box": compute_union(group_boxes),
                "font_size": max(b["font_size"] for b in group),
                **infos,
            }
        )
    return lines


def group_lines_in_paragraphs(lines, *, indent_threshold=0.008, y_threshold=0.8):
    """pdf_parser.py:268-346 semantics."""
    if len(lines) <= 1:
        return [dict(l) for l in lines]

    boxes = np.array([l["box"] for l in lines], dtype=np.float64)

    groups, group, group_indexes = [], [lines[0]], [0]
    for i, line in enumerate(lines[1:], start=1):
        if group and (
            abs(line["font_size"] - group[-1]["font_size"]) > 1
            or line["box"][1] - group[-1]["box"][3]
            > (line["box"][3] - line["box"][1]) * y_threshold
        ):
            groups.append((group, boxes[group_indexes]))
            group, group_indexes = [], []
        group.append(line)
        group_indexes.append(i)
    if group:
        groups.append((group, boxes[group_indexes]))

    paragraphs = []
    for group, group_boxes in groups:
        if len(group) == 1:
            paragraphs.append({**group[0], "lines": group_boxes})
            continue

        left = np.min(group_boxes[:, 0])
        text, infos, last_idx = "", {}, 0
        for j, (line, box) in enumerate(zip(group, group_boxes)):
            if text and (
                line.get("is_footnote", False)
                or (line["text"][0].isupper() and box[0] - left > indent_threshold)
            ):
                paragraphs.append(
                    {
                        "text": text,
                        "box": compute_union(group_boxes[last_idx:j]),
                        "lines": group_boxes[last_idx:j],
                        "font_size": max(l["font_size"] for l in group[last_idx:j]),
                        **infos,
                    }
                )
                text, infos, last_idx = "", {}, j

            if text:
                if text[-1] != "\x02":  # soft hyphen: join without break
                    text += " \n"
                else:
                    text = text[:-1]
            text += line["text"]
            if line.get("is_footnote", False):
                infos.update({"is_footnote": True, "footnote_index": line["footnote_index"]})
            elif line.get("footnotes", []):
                infos.setdefault("footnotes", []).extend(line["footnotes"])

        if text:
            paragraphs.append(
                {
                    "text": text,
                    "box": compute_union(group_boxes[last_idx:]),
                    "lines": group_boxes[last_idx:],
                    "font_size": max(l["font_size"] for l in group[last_idx:]),
                    **infos,
                }
            )
    return paragraphs


def order_weight(para: dict) -> int:
    """header(0) < body(1) < footnote(2) < page-number(3) (pdf_parser.py:361-369)."""
    if para.get("is_header", False):
        return 0
    if para.get("is_footnote", False):
        return 2
    if para.get("is_page_number", False):
        return 3
    return 1


def process_page(blocks, *, header_threshold=0.1, **kwargs):
    """Full page: lines -> paragraphs -> footnote/header/page-number flags ->
    stable order-weight sort (pdf_parser.py:140-170)."""
    lines = group_blocks_in_lines(blocks, **{k: v for k, v in kwargs.items() if k in ("factor", "space_threshold")})
    content = group_lines_in_paragraphs(lines, **{k: v for k, v in kwargs.items() if k in ("indent_threshold", "y_threshold")})
    if not content:
        return []

    font_size = sorted(p["font_size"] for p in content if "font_size" in p)
    font_size = font_size[len(font_size) // 2]
    for i, para in enumerate(content):
        if i and "font_size" in para and not para.get("is_footnote", False):
            if (font_size - para["font_size"] > 1.5) and (
                i == len(content) - 1 or para["box"][1] > content[i + 1]["box"][1]
            ):
                para["is_footnote"] = True
        if "text" in para and para["box"][1] <= header_threshold and "\n" not in para["text"]:
            para["is_header"] = True

    if content[-1].get("text", "").isdigit():
        content[-1]["is_page_number"] = True

    return sorted(content, key=order_weight)
