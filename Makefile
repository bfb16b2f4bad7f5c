# Common developer targets
.PHONY: test bench demo macs entry clean train-profile sweep roofline oracle export

train-profile:
	python tools/train_profile.py --batches 32,64,128,256

sweep:
	python tools/sweep_streams.py

roofline:
	python tools/roofline.py --streams 128

oracle:
	python tools/reference_oracle.py

export:
	python -m feartracker_tpu.convert.export --out_dir outputs/export

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-quick:
	BENCH_WARMUP=1 BENCH_TIMED=5 BENCH_STREAMS=32 BENCH_CHUNK=8 python bench.py

demo:
	python demo_video.py --max_frames 60 --output_path outputs/test.mp4

macs:
	python -m feartracker_tpu.evaluate.cli macs

entry:
	python __graft_entry__.py

clean:
	rm -rf outputs experiments feartracker_tpu/native/*.so
