from masa_tpu.cli import main

raise SystemExit(main())
