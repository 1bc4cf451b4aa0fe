"""Aggregate metrics from per-seed log files.

Same CLI and behavior as the reference ``parse_test_res.py``: scan
``<dir>/seed*/log[_<calibrators>].txt`` for ``* <keyword>: NN.NN%`` lines
after the ``=> result`` sentinel (``--test-log``) or after
``Finished training``, report mean +- std (or CI95) across seeds, and
append rows to ``output/base2new/logs_base2new.csv`` or
``output/xd/logs_xd.csv`` keyed by the directory layout.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import re
from collections import OrderedDict, defaultdict

import numpy as np


def listdir_nohidden(path, sort=True):
    items = [f for f in os.listdir(path) if not f.startswith(".")]
    if sort:
        items.sort()
    return items


def compute_ci95(res):
    return 1.96 * np.std(res) / np.sqrt(len(res))


def log_basename(calibration_config) -> str:
    """Reconstruct the calibrator-combo log filename
    (reference parse_test_res.py:160-179)."""
    base_name = "log"
    if calibration_config:
        cal = json.loads(calibration_config)
        if cal.get("BASE_CALIBRATION_MODE"):
            if cal.get("SCALING_CONFIG"):
                base_name += "_" + cal["SCALING_CALIBRATOR_NAME"]
            if cal.get("BIN_CALIBRATOR_NAME"):
                base_name += "_" + cal["BIN_CALIBRATOR_NAME"]
        if cal.get("IF_DAC"):
            base_name += "_dac"
        if cal.get("IF_PROCAL"):
            base_name += "_procal"
    return base_name + ".txt"


def results_to_csv(args, directory, key, results):
    if "train_base" in directory or "test_new" in directory:
        _append_csv(args, directory, key, results, mode="base2new")
    elif "xd_test" in directory or "xd_train" in directory:
        _append_csv(args, directory, key, results, mode="xd")


def _append_csv(args, directory, key, results, mode):
    import pandas as pd
    parts = directory.split("/")
    if mode == "base2new":
        # output/base2new/<split>/<dataset>/shots_<S>/<algo>/<cfgs>/...
        split, dataset = parts[2], parts[3]
        shot = int(parts[4].split("_")[1])
        algorithm, cfgs = parts[5], parts[6]
        row = {"dataset": dataset, "split": split, "shot": shot}
        csv_file = "output/base2new/logs_base2new.csv"
    else:
        split, algorithm, cfgs, dataset = parts[2], parts[3], parts[4], \
            parts[5]
        row = {"dataset": dataset, "split": split}
        csv_file = "output/xd/logs_xd.csv"

    if args.calibration_config:
        cal = json.loads(args.calibration_config)
        if cal.get("BASE_CALIBRATION_MODE"):
            if cal.get("SCALING_CONFIG"):
                algorithm += "+" + cal["SCALING_CALIBRATOR_NAME"]
            if cal.get("BIN_CALIBRATOR_NAME"):
                algorithm += "+" + cal["BIN_CALIBRATOR_NAME"]
        if cal.get("IF_DAC"):
            algorithm += "+DAC"
        if cal.get("IF_PROCAL"):
            algorithm += "+ProCal"

    row.update({"algorithm": algorithm, "cfgs": cfgs, "metrics": key,
                "results": results})
    df = pd.DataFrame([row])
    os.makedirs(osp.dirname(csv_file), exist_ok=True)
    if os.path.exists(csv_file):
        df = pd.concat([pd.read_csv(csv_file), df], ignore_index=True)
    df.to_csv(csv_file, index=False)


def parse_function(*metrics, directory="", args=None, end_signal=None):
    print(f"Parsing files in {directory}")
    base_name = log_basename(args.calibration_config)

    outputs = []
    for subdir in listdir_nohidden(directory, sort=True):
        fpath = osp.join(directory, subdir, base_name)
        if not osp.isfile(fpath):
            raise FileNotFoundError(fpath)
        good_to_go = False
        output = OrderedDict()
        with open(fpath) as f:
            for line in f:
                line = line.strip()
                if line == end_signal:
                    good_to_go = True
                for metric in metrics:
                    match = metric["regex"].search(line)
                    if match and good_to_go:
                        output.setdefault("file", fpath)
                        output[metric["name"]] = float(match.group(1))
        if output:
            outputs.append(output)

    assert len(outputs) > 0, f"Nothing found in {directory}"

    metrics_results = defaultdict(list)
    for output in outputs:
        msg = ""
        for key, value in output.items():
            if isinstance(value, float):
                msg += f"{key}: {value:.2f}%. "
            else:
                msg += f"{key}: {value}. "
            if key != "file":
                metrics_results[key].append(value)
        print(msg)

    output_results = OrderedDict()
    print("===")
    print(f"Summary of directory: {directory}")
    for key, values in metrics_results.items():
        avg = np.mean(values)
        std = compute_ci95(values) if args.ci95 else np.std(values)
        print(f"* {key}: {avg:.2f}% +- {std:.2f}%")
        output_results[key] = avg
        results_to_csv(args, directory, key, f"{avg:.2f}")
    print("===")
    return output_results


def main(args, end_signal):
    metric = {
        "name": args.keyword,
        "regex": re.compile(fr"\* {args.keyword}: ([\.\deE+-]+)%"),
    }
    if args.multi_exp:
        final_results = defaultdict(list)
        for directory in listdir_nohidden(args.directory, sort=True):
            results = parse_function(
                metric, directory=osp.join(args.directory, directory),
                args=args, end_signal=end_signal)
            for key, value in results.items():
                final_results[key].append(value)
        print("Average performance")
        for key, values in final_results.items():
            print(f"* {key}: {np.mean(values):.2f}%")
    else:
        parse_function(metric, directory=args.directory, args=args,
                       end_signal=end_signal)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("directory", type=str, help="path to directory")
    parser.add_argument("--ci95", action="store_true",
                        help=r"compute 95\% confidence interval")
    parser.add_argument("--test-log", action="store_true",
                        help="parse test-only logs")
    parser.add_argument("--multi-exp", action="store_true",
                        help="parse multiple experiments")
    parser.add_argument("--keyword", default="accuracy", type=str,
                        help="which keyword to extract")
    parser.add_argument("--calibration-config", default=False, type=str,
                        help="reconstruct calibrated log filenames")
    args = parser.parse_args()

    end_signal = "Finished training"
    if args.test_log:
        end_signal = "=> result"
    main(args, end_signal)
