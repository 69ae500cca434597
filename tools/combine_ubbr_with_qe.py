"""Replace verified candidates' boxes with UBBR-corrected ones by
annotation id -> ``*_id.json`` (reference tools/combine_ubbr_with_qe.py:36-48)."""
from __future__ import annotations

import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lvc_tpu.data.coco_api import COCO

parser = argparse.ArgumentParser(description="Combine ubbr with pseudo-annotations")
parser.add_argument("--ubbr-data", required=True, help="path to the corrected-box json")
parser.add_argument("--qe-data", required=True, help="path to the verified candidate json")


def main(args):
    coco_qe = COCO(args.qe_data)
    with open(args.ubbr_data) as f:
        json_ubbr = json.load(f)
    uaid2anns = {a["id"]: a for a in json_ubbr}
    anns_new = []
    for a in copy.deepcopy(coco_qe.loadAnns(list(uaid2anns.keys()))):
        assert a["id"] in uaid2anns
        a["bbox"] = uaid2anns[a["id"]]["bbox"]
        anns_new.append(a)

    save_dict = {k: v for k, v in coco_qe.dataset.items() if k != "annotations"}
    save_dict["annotations"] = anns_new
    save_name = args.ubbr_data.replace(".json", "_id.json")
    print(save_name)
    with open(save_name, "w") as fp:
        json.dump(save_dict, fp, indent=4, sort_keys=True)
    return save_name


if __name__ == "__main__":
    main(parser.parse_args())
