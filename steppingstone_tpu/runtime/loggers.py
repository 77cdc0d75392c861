"""progress.csv + console logging, drop-in compatible with the reference.

Schema and console line format match `common/csv_utils.py:16-68` exactly
(columns iter, total_num_steps, fps, entropy, value_loss, action_loss,
{mean,median,min,max}_rew, test_{...}_rew) so the reference's
`plot_from_csv.py` workflow keeps working on our runs.
"""

from __future__ import annotations

import csv
import os

import numpy as np


class CSVLogger:
    def __init__(self, log_dir, filename="progress.csv"):
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir, filename)
        # append so resumed runs extend the same learning curve; write the
        # header only for a fresh file
        had_rows = os.path.exists(path) and os.path.getsize(path) > 0
        self.csvfile = open(path, "a", newline="")
        self._header_written = had_rows
        self.writer = None

    def _expand_stats(self, data):
        for group, prefix in (("stats", ""), ("test_stats", "test_")):
            if group in data:
                for key, values in data[group].items():
                    values = np.asarray(values)
                    if values.size == 0:
                        values = np.array([0.0])
                    data[prefix + "mean_" + key] = float(np.mean(values))
                    data[prefix + "median_" + key] = float(np.median(values))
                    data[prefix + "min_" + key] = float(np.min(values))
                    data[prefix + "max_" + key] = float(np.max(values))
                del data[group]
        return data

    def log_epoch(self, data: dict):
        data = self._expand_stats(dict(data))
        if self.writer is None:
            self.writer = csv.DictWriter(self.csvfile, fieldnames=list(data))
            if not self._header_written:
                self.writer.writeheader()
                self._header_written = True
        self.writer.writerow(data)
        self.csvfile.flush()
        return data

    def close(self):
        self.csvfile.close()


class ConsoleCSVLogger(CSVLogger):
    """Reference `ConsoleCSVLogger` (csv_utils.py:41-68)."""

    def __init__(self, log_dir, console_log_interval=1, **kw):
        super().__init__(log_dir, **kw)
        self.console_log_interval = console_log_interval

    def log_epoch(self, data: dict):
        data = super().log_epoch(data)
        if data["iter"] % self.console_log_interval == 0:
            print(
                "Updates {}, num timesteps {}, FPS {}, "
                "mean/median reward {:.1f}/{:.1f}, min/max reward {:.1f}/{:.1f}, "
                "test_mean/median reward {:.1f}/{:.1f}, "
                "test_min/max reward {:.1f}/{:.1f}, "
                "entropy {:.5f}, value loss {:.5f}, policy loss {:.5f}".format(
                    data["iter"], data["total_num_steps"], data["fps"],
                    data["mean_rew"], data["median_rew"],
                    data["min_rew"], data["max_rew"],
                    data.get("test_mean_rew", 0.0), data.get("test_median_rew", 0.0),
                    data.get("test_min_rew", 0.0), data.get("test_max_rew", 0.0),
                    data["entropy"], data["value_loss"], data["action_loss"],
                ),
                flush=True,
            )
        return data
