from hot_tpu.cli import main

raise SystemExit(main())
