"""CameraBench video download (reference camerabench/data_download.py:19-72):
HF snapshot_download of syCen/Videos4CameraBench with retry + exponential
backoff."""

import argparse
import time


def download_videos(output_dir: str = "data/videos", max_retries: int = 5,
                    repo_id: str = "syCen/Videos4CameraBench"):
    from huggingface_hub import snapshot_download

    delay = 5.0
    for attempt in range(max_retries):
        try:
            path = snapshot_download(repo_id=repo_id, repo_type="dataset",
                                     local_dir=output_dir)
            print(f"Downloaded to {path}")
            return path
        except Exception as e:
            if attempt == max_retries - 1:
                raise
            print(f"Download attempt {attempt + 1} failed: {e}; "
                  f"retrying in {delay:.0f}s")
            time.sleep(delay)
            delay *= 2


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", default="data/videos")
    parser.add_argument("--max_retries", type=int, default=5)
    args = parser.parse_args()
    download_videos(args.output_dir, args.max_retries)


if __name__ == "__main__":
    main()
