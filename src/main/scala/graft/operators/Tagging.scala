package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Tier-1 automated tagging + concept normalization — the zero-cost
  * metadata tiers of the reference's tagging system (tagging/tier1.rs
  * `extract_path_tags`/`extract_tier1_tags`, tagging/concepts.rs
  * CONCEPT_MAP + `map_deps_to_concepts`, tagging/normalize.rs
  * `normalize_tag`). The PDF-metadata source (tier1.rs:152) is binary
  * Info-dict I/O the container cannot decode — the corpus carries no
  * PDFs with metadata, so that source contributes nothing here (the
  * multimodal module owns the binary-payload plumbing pattern).
  *
  * Relational shape: path tags are a pure projection (split + filter +
  * kebab regexp chain); dependency concepts are a BROADCAST join of the
  * parsed manifest deps against the ~240-row concept table with a
  * prefix-match predicate; normalization is a codegen'd expression.
  */
object Tagging {

  /** Structural directories that carry no semantic meaning
    * (tier1.rs:17 SKIP_DIRS). */
  val skipDirs: Seq[String] = Seq("src", "lib", "test", "tests", "spec",
    "specs", "utils", "util", "docs", "doc", "build", "dist", "out", "bin",
    "target", "vendor", "node_modules", ".git", ".github", ".vscode",
    "assets", "static", "public", "private", "internal", "pkg", "cmd",
    "include")

  /** concepts.rs CONCEPT_MAP mirrored verbatim: dependency name →
    * concept tags (matched on equality or `<name>-` prefix after
    * lowercase/underscore normalization). */
  val conceptMap: Seq[(String, Seq[String])] = Seq(
    "tokio" -> Seq("async-runtime", "concurrency"),
    "async-std" -> Seq("async-runtime", "concurrency"),
    "serde" -> Seq("serialization"),
    "serde_json" -> Seq("json", "serialization"),
    "serde_yaml" -> Seq("yaml", "serialization"),
    "toml" -> Seq("toml", "configuration"),
    "reqwest" -> Seq("http-client", "networking"),
    "hyper" -> Seq("http", "networking"),
    "actix-web" -> Seq("web-framework", "http-server"),
    "axum" -> Seq("web-framework", "http-server"),
    "warp" -> Seq("web-framework", "http-server"),
    "rocket" -> Seq("web-framework", "http-server"),
    "diesel" -> Seq("orm", "database"),
    "sqlx" -> Seq("database", "sql"),
    "sea-orm" -> Seq("orm", "database"),
    "rusqlite" -> Seq("sqlite", "database"),
    "clap" -> Seq("cli", "argument-parsing"),
    "structopt" -> Seq("cli", "argument-parsing"),
    "tracing" -> Seq("observability", "logging"),
    "log" -> Seq("logging"),
    "env-logger" -> Seq("logging"),
    "tonic" -> Seq("grpc", "rpc"),
    "prost" -> Seq("protobuf", "serialization"),
    "rayon" -> Seq("parallelism", "concurrency"),
    "crossbeam" -> Seq("concurrency"),
    "qdrant-client" -> Seq("vector-database", "search"),
    "fastembed" -> Seq("embeddings", "ml"),
    "anyhow" -> Seq("error-handling"),
    "thiserror" -> Seq("error-handling"),
    "rand" -> Seq("randomness"),
    "regex" -> Seq("regex", "text-processing"),
    "chrono" -> Seq("datetime"),
    "time" -> Seq("datetime"),
    "uuid" -> Seq("identifiers"),
    "sha2" -> Seq("cryptography", "hashing"),
    "ring" -> Seq("cryptography"),
    "rustls" -> Seq("tls", "cryptography"),
    "tower" -> Seq("middleware", "networking"),
    "bytes" -> Seq("binary", "networking"),
    "futures" -> Seq("async-runtime"),
    "tokio-stream" -> Seq("streaming", "async-runtime"),
    "nom" -> Seq("parsing"),
    "pest" -> Seq("parsing"),
    "tree-sitter" -> Seq("parsing", "syntax-analysis"),
    "image" -> Seq("image-processing"),
    "wasm-bindgen" -> Seq("webassembly"),
    "napi" -> Seq("ffi", "node-binding"),
    "pyo3" -> Seq("ffi", "python-binding"),
    "bindgen" -> Seq("ffi", "code-generation"),
    "proc-macro2" -> Seq("metaprogramming"),
    "syn" -> Seq("metaprogramming", "parsing"),
    "quote" -> Seq("metaprogramming", "code-generation"),
    "criterion" -> Seq("benchmarking", "testing"),
    "proptest" -> Seq("property-testing", "testing"),
    "tempfile" -> Seq("testing", "filesystem"),
    "notify" -> Seq("file-watching", "filesystem"),
    "walkdir" -> Seq("filesystem"),
    "glob" -> Seq("filesystem"),
    "redis" -> Seq("cache", "database"),
    "lapin" -> Seq("message-queue"),
    "rdkafka" -> Seq("message-queue", "streaming"),
    "aws-sdk" -> Seq("cloud", "aws"),
    "rusoto" -> Seq("cloud", "aws"),
    "bollard" -> Seq("docker", "containers"),
    "k8s-openapi" -> Seq("kubernetes", "containers"),
    "ort" -> Seq("ml-inference", "ml"),
    "candle" -> Seq("deep-learning", "ml"),
    "polars" -> Seq("data-analysis", "dataframes"),
    "arrow" -> Seq("data-processing", "columnar"),
    "react" -> Seq("ui-framework", "frontend"),
    "react-dom" -> Seq("ui-framework", "frontend"),
    "vue" -> Seq("ui-framework", "frontend"),
    "angular" -> Seq("ui-framework", "frontend"),
    "svelte" -> Seq("ui-framework", "frontend"),
    "solid-js" -> Seq("ui-framework", "frontend"),
    "preact" -> Seq("ui-framework", "frontend"),
    "express" -> Seq("web-framework", "http-server"),
    "fastify" -> Seq("web-framework", "http-server"),
    "koa" -> Seq("web-framework", "http-server"),
    "hono" -> Seq("web-framework", "http-server"),
    "next" -> Seq("web-framework", "ssr"),
    "nuxt" -> Seq("web-framework", "ssr"),
    "remix" -> Seq("web-framework", "ssr"),
    "astro" -> Seq("web-framework", "ssg"),
    "gatsby" -> Seq("web-framework", "ssg"),
    "jest" -> Seq("testing"),
    "mocha" -> Seq("testing"),
    "vitest" -> Seq("testing"),
    "cypress" -> Seq("e2e-testing", "testing"),
    "playwright" -> Seq("e2e-testing", "testing"),
    "webpack" -> Seq("bundler", "build-tool"),
    "vite" -> Seq("bundler", "build-tool"),
    "esbuild" -> Seq("bundler", "build-tool"),
    "rollup" -> Seq("bundler", "build-tool"),
    "turbo" -> Seq("monorepo", "build-tool"),
    "typescript" -> Seq("type-system"),
    "prisma" -> Seq("orm", "database"),
    "drizzle-orm" -> Seq("orm", "database"),
    "typeorm" -> Seq("orm", "database"),
    "sequelize" -> Seq("orm", "database"),
    "knex" -> Seq("query-builder", "database"),
    "mongoose" -> Seq("orm", "database"),
    "axios" -> Seq("http-client", "networking"),
    "node-fetch" -> Seq("http-client", "networking"),
    "socket.io" -> Seq("websocket", "realtime"),
    "ws" -> Seq("websocket", "networking"),
    "graphql" -> Seq("graphql", "api"),
    "apollo-server" -> Seq("graphql", "api"),
    "trpc" -> Seq("rpc", "api"),
    "zod" -> Seq("validation", "schema"),
    "joi" -> Seq("validation", "schema"),
    "yup" -> Seq("validation", "schema"),
    "tailwindcss" -> Seq("css", "styling"),
    "styled-components" -> Seq("css-in-js", "styling"),
    "emotion" -> Seq("css-in-js", "styling"),
    "redux" -> Seq("state-management", "frontend"),
    "zustand" -> Seq("state-management", "frontend"),
    "mobx" -> Seq("state-management", "frontend"),
    "tanstack-query" -> Seq("data-fetching", "frontend"),
    "react-query" -> Seq("data-fetching", "frontend"),
    "swr" -> Seq("data-fetching", "frontend"),
    "d3" -> Seq("data-visualization"),
    "chart.js" -> Seq("data-visualization"),
    "three" -> Seq("3d-graphics", "webgl"),
    "lodash" -> Seq("utility"),
    "date-fns" -> Seq("datetime"),
    "dayjs" -> Seq("datetime"),
    "moment" -> Seq("datetime"),
    "uuid" -> Seq("identifiers"),
    "winston" -> Seq("logging"),
    "pino" -> Seq("logging"),
    "bull" -> Seq("task-queue", "job-processing"),
    "bullmq" -> Seq("task-queue", "job-processing"),
    "ioredis" -> Seq("cache", "database"),
    "kafkajs" -> Seq("message-queue", "streaming"),
    "amqplib" -> Seq("message-queue"),
    "aws-sdk" -> Seq("cloud", "aws"),
    "firebase" -> Seq("cloud", "baas"),
    "supabase" -> Seq("cloud", "baas"),
    "stripe" -> Seq("payments"),
    "passport" -> Seq("authentication"),
    "jsonwebtoken" -> Seq("authentication", "jwt"),
    "bcrypt" -> Seq("cryptography", "authentication"),
    "sharp" -> Seq("image-processing"),
    "puppeteer" -> Seq("browser-automation"),
    "cheerio" -> Seq("web-scraping"),
    "electron" -> Seq("desktop-app"),
    "tauri" -> Seq("desktop-app"),
    "react-native" -> Seq("mobile", "frontend"),
    "expo" -> Seq("mobile", "frontend"),
    "storybook" -> Seq("component-docs", "frontend"),
    "eslint" -> Seq("linting", "code-quality"),
    "prettier" -> Seq("formatting", "code-quality"),
    "django" -> Seq("web-framework", "http-server"),
    "flask" -> Seq("web-framework", "http-server"),
    "fastapi" -> Seq("web-framework", "http-server"),
    "starlette" -> Seq("web-framework", "http-server"),
    "tornado" -> Seq("web-framework", "http-server"),
    "aiohttp" -> Seq("http-client", "async", "http-server"),
    "httpx" -> Seq("http-client", "networking"),
    "pandas" -> Seq("data-analysis", "dataframes"),
    "polars" -> Seq("data-analysis", "dataframes"),
    "numpy" -> Seq("numerical-computing"),
    "scipy" -> Seq("scientific-computing"),
    "matplotlib" -> Seq("data-visualization"),
    "seaborn" -> Seq("data-visualization"),
    "plotly" -> Seq("data-visualization"),
    "scikit-learn" -> Seq("machine-learning"),
    "xgboost" -> Seq("machine-learning"),
    "lightgbm" -> Seq("machine-learning"),
    "tensorflow" -> Seq("deep-learning", "ml"),
    "keras" -> Seq("deep-learning", "ml"),
    "pytorch" -> Seq("deep-learning", "ml"),
    "torch" -> Seq("deep-learning", "ml"),
    "transformers" -> Seq("nlp", "deep-learning"),
    "langchain" -> Seq("llm", "ai-agents"),
    "openai" -> Seq("llm", "ai-api"),
    "anthropic" -> Seq("llm", "ai-api"),
    "sqlalchemy" -> Seq("orm", "database"),
    "alembic" -> Seq("database-migration", "database"),
    "psycopg2" -> Seq("postgresql", "database"),
    "pymongo" -> Seq("mongodb", "database"),
    "redis" -> Seq("cache", "database"),
    "pytest" -> Seq("testing"),
    "unittest" -> Seq("testing"),
    "hypothesis" -> Seq("property-testing", "testing"),
    "requests" -> Seq("http-client", "networking"),
    "beautifulsoup4" -> Seq("web-scraping"),
    "scrapy" -> Seq("web-scraping"),
    "celery" -> Seq("task-queue", "async"),
    "rq" -> Seq("task-queue"),
    "pydantic" -> Seq("validation", "schema"),
    "marshmallow" -> Seq("serialization", "validation"),
    "click" -> Seq("cli", "argument-parsing"),
    "typer" -> Seq("cli", "argument-parsing"),
    "argparse" -> Seq("cli", "argument-parsing"),
    "boto3" -> Seq("cloud", "aws"),
    "google-cloud" -> Seq("cloud", "gcp"),
    "pillow" -> Seq("image-processing"),
    "opencv-python" -> Seq("computer-vision", "image-processing"),
    "spacy" -> Seq("nlp", "text-processing"),
    "nltk" -> Seq("nlp", "text-processing"),
    "black" -> Seq("formatting", "code-quality"),
    "mypy" -> Seq("type-checking", "code-quality"),
    "ruff" -> Seq("linting", "code-quality"),
    "streamlit" -> Seq("dashboard", "data-visualization"),
    "gradio" -> Seq("ml-demo", "ui"),
    "dask" -> Seq("distributed-computing", "data-processing"),
    "airflow" -> Seq("workflow-orchestration", "data-engineering"),
    "prefect" -> Seq("workflow-orchestration", "data-engineering"),
    "docker" -> Seq("docker", "containers"),
    "kubernetes" -> Seq("kubernetes", "containers"),
    "cryptography" -> Seq("cryptography"),
    "gin" -> Seq("web-framework", "http-server"),
    "echo" -> Seq("web-framework", "http-server"),
    "fiber" -> Seq("web-framework", "http-server"),
    "chi" -> Seq("web-framework", "http-server"),
    "gorm" -> Seq("orm", "database"),
    "ent" -> Seq("orm", "database"),
    "cobra" -> Seq("cli", "argument-parsing"),
    "viper" -> Seq("configuration"),
    "zap" -> Seq("logging", "observability"),
    "logrus" -> Seq("logging"),
    "grpc" -> Seq("grpc", "rpc"),
    "protobuf" -> Seq("protobuf", "serialization"),
    "testify" -> Seq("testing"),
    "gomock" -> Seq("testing", "mocking"),
    "wire" -> Seq("dependency-injection"),
    "fx" -> Seq("dependency-injection"),
    "sarama" -> Seq("message-queue", "streaming"),
    "nats" -> Seq("message-queue"),
    "go-redis" -> Seq("cache", "database"),
    "pgx" -> Seq("postgresql", "database"),
    "mongo-driver" -> Seq("mongodb", "database"),
    "aws-sdk-go" -> Seq("cloud", "aws"),
    "mux" -> Seq("http-router"),
    "gorilla" -> Seq("websocket", "http"),
    "prometheus" -> Seq("metrics", "observability"),
    "otel" -> Seq("observability", "tracing"),
    "jwt-go" -> Seq("authentication", "jwt"),
    "casbin" -> Seq("authorization", "access-control")
  )

  /** Abbreviation → canonical form map (normalize.rs:20). */
  val abbreviationMap: Map[String, String] = Map(
    "ml" -> "machine-learning", "js" -> "javascript", "ts" -> "typescript",
    "db" -> "database", "api" -> "api", "ui" -> "user-interface",
    "ux" -> "user-experience", "ai" -> "artificial-intelligence",
    "nlp" -> "natural-language-processing", "cv" -> "computer-vision",
    "k8s" -> "kubernetes", "tf" -> "tensorflow", "py" -> "python")

  /** normalize_to_kebab (tier1.rs:100): drop chars that are neither
    * alphanumeric nor separators, hyphenate camelCase boundaries and
    * separator runs, lowercase, trim edge hyphens. */
  def normalizeToKebab(c: Column): Column = {
    val kept = regexp_replace(c, "[^A-Za-z0-9_ \\-]", "")
    val camel = regexp_replace(kept, "([a-z])([A-Z])", "$1-$2")
    val seps = regexp_replace(lower(camel), "[_ \\-]+", "-")
    regexp_replace(seps, "^-+|-+$", "")
  }

  /** normalize_value (normalize.rs:72): like the kebab normalizer but
    * WITHOUT camelCase splitting, plus the abbreviation map on the
    * fully normalized value. */
  def normalizeValue(c: Column): Column = {
    val kept = regexp_replace(trim(c), "[^A-Za-z0-9_ \\-]", "")
    val seps = regexp_replace(lower(kept), "[_ \\-]+", "-")
    val base = regexp_replace(seps, "^-+|-+$", "")
    coalesce(element_at(typedLit(abbreviationMap), base), base)
  }

  /** normalize_tag (normalize.rs:53): a `prefix:` survives lowercased
    * with only the value normalized; a tag whose value normalizes away
    * collapses to the empty string. */
  def normalizeTag(c: Column): Column = {
    val t = trim(c)
    val prefix = lower(substring_index(t, ":", 1))
    val value = normalizeValue(regexp_extract(t, "^[^:]*:(.*)$", 1))
    when(t.contains(":"),
      when(value === "", "").otherwise(concat(prefix, lit(":"), value)))
      .otherwise(normalizeValue(t))
  }

  /** extract_path_tags (tier1.rs:54): every directory component except
    * the filename, skipping structural/hidden/single-char names, kebab
    * normalized, `path:` prefixed, tags of length >= 2 only. */
  def pathTagsOf(files: DataFrame): DataFrame = {
    val segs = split(col("file_path"), "/")
    val dirs = slice(segs, lit(1), size(segs) - 1)
    files
      .select(col("doc_id"), explode(dirs).as("seg"))
      .filter(col("seg") =!= "" && !col("seg").startsWith(".") &&
        length(col("seg")) > 1 &&
        !lower(col("seg")).isInCollection(skipDirs.map(_.toLowerCase)))
      .withColumn("tag", normalizeToKebab(col("seg")))
      .filter(length(col("tag")) >= 2)
      .select(col("doc_id"), concat(lit("path:"), col("tag")).as("tag"))
      .distinct()
  }

  /** map_deps_to_concepts (concepts.rs:354) over a (tenant_id,
    * dependency_name) frame: names lowercased with underscores
    * hyphenated, matched on equality or `<name>-` prefix against the
    * broadcast concept table, one `dep:` tag per distinct concept. */
  def depConceptsOf(deps: DataFrame): DataFrame = {
    val spark = deps.sparkSession
    import spark.implicits._
    val table = conceptMap.flatMap { case (n, cs) => cs.map(c => (n, c)) }
      .toDF("dep_key", "concept")
    deps
      .withColumn("norm", replace(lower(col("dependency_name")), lit("_"), lit("-")))
      .join(broadcast(table),
        col("norm") === col("dep_key") ||
          col("norm").startsWith(concat(col("dep_key"), lit("-"))))
      .select(col("tenant_id"), concat(lit("dep:"), col("concept")).as("tag"))
      .distinct()
  }

  /** tier1_tags query (tier1.rs:245 extract_tier1_tags): path tags over
    * the shared synthetic path corpus plus dependency concepts from the
    * dependency-grouping manifests, joined to each tenant's documents.
    * The reference dispatches concepts only for cargo/npm/pip/gomod —
    * pyproject manifests have no concept extractor and contribute
    * nothing; go module paths match on their LAST segment
    * (concepts.rs:344). One (doc_id, tag) row per distinct tag.
    */
  def tier1Tags(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source").as("tenant_id"),
        FileClassification.syntheticPathCol.as("file_path"))
      .localCheckpoint()
    val pathTags = pathTagsOf(docs.select(col("doc_id"), col("file_path")))
    val parsed = DependencyGrouping.parseDependenciesOf(
      DependencyGrouping.syntheticManifests(spark, dir)
        .filter(col("filename") =!= "pyproject.toml"))
    val names = parsed.withColumn("dependency_name",
      when(col("ecosystem") === "go",
        element_at(split(col("dependency_name"), "/"), -1))
        .otherwise(col("dependency_name")))
    val depTags = docs.select(col("doc_id"), col("tenant_id"))
      .join(depConceptsOf(names), "tenant_id")
      .select(col("doc_id"), col("tag"))
    pathTags.union(depTags).distinct().orderBy(col("doc_id"), col("tag"))
  }

  /** tag_normalize query (normalize.rs:53): the canonicalization pass
    * every stored tag goes through, over a deterministic raw-tag column
    * exercising each branch — whitespace, separators and runs, junk
    * chars, camel NON-splitting, abbreviation expansion (bare and
    * behind prefixes), prefix lowercasing, and values that normalize
    * away entirely.
    */
  def tagNormalize(spark: SparkSession, dir: String): DataFrame = {
    val raws = Seq("  Machine_Learning  ", "ML", "dep:ML", "path:my_module",
      "Design Patterns", "k8s", "tax:Deep__Learning", "CamelCase",
      "API-Design", "js", "TAX:  spaced  value ", "path:!!!")
    val raw = element_at(array(raws.map(lit): _*),
      (pmod(col("doc_id"), lit(raws.length)) + 1).cast("int"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), raw.as("raw_tag"))
      .withColumn("normalized", normalizeTag(col("raw_tag")))
      .orderBy(col("doc_id"))
  }

  /** assets/taxonomy.yaml mirrored verbatim: (term, category) — the
    * ~190 concept phrases tier 2 classifies against. */
  val taxonomy: Seq[(String, String)] = Seq(
    ("rust programming", "programming-languages"),
    ("python programming", "programming-languages"),
    ("javascript programming", "programming-languages"),
    ("typescript programming", "programming-languages"),
    ("go programming", "programming-languages"),
    ("java programming", "programming-languages"),
    ("c programming language", "programming-languages"),
    ("cpp programming", "programming-languages"),
    ("swift programming", "programming-languages"),
    ("kotlin programming", "programming-languages"),
    ("ruby programming", "programming-languages"),
    ("php programming", "programming-languages"),
    ("scala programming", "programming-languages"),
    ("haskell programming", "programming-languages"),
    ("lua scripting", "programming-languages"),
    ("shell scripting", "programming-languages"),
    ("sql database queries", "programming-languages"),
    ("web application development", "web-development"),
    ("frontend user interface", "web-development"),
    ("backend server development", "web-development"),
    ("single page application", "web-development"),
    ("server side rendering", "web-development"),
    ("progressive web app", "web-development"),
    ("responsive web design", "web-development"),
    ("web accessibility", "web-development"),
    ("web performance optimization", "web-development"),
    ("static site generation", "web-development"),
    ("content management system", "web-development"),
    ("rest api design", "api-and-protocols"),
    ("graphql api", "api-and-protocols"),
    ("grpc remote procedure call", "api-and-protocols"),
    ("websocket real-time communication", "api-and-protocols"),
    ("http protocol", "api-and-protocols"),
    ("oauth authentication protocol", "api-and-protocols"),
    ("json web token authentication", "api-and-protocols"),
    ("relational database management", "databases"),
    ("nosql database", "databases"),
    ("vector database search", "databases"),
    ("graph database", "databases"),
    ("key value store", "databases"),
    ("time series database", "databases"),
    ("database indexing", "databases"),
    ("query optimization", "databases"),
    ("database migration", "databases"),
    ("object relational mapping", "databases"),
    ("cloud computing infrastructure", "cloud-and-infrastructure"),
    ("kubernetes container orchestration", "cloud-and-infrastructure"),
    ("docker containerization", "cloud-and-infrastructure"),
    ("serverless computing", "cloud-and-infrastructure"),
    ("infrastructure as code", "cloud-and-infrastructure"),
    ("continuous integration deployment", "cloud-and-infrastructure"),
    ("load balancing", "cloud-and-infrastructure"),
    ("service mesh", "cloud-and-infrastructure"),
    ("cloud native architecture", "cloud-and-infrastructure"),
    ("microservices architecture", "cloud-and-infrastructure"),
    ("machine learning algorithms", "machine-learning"),
    ("deep learning neural networks", "machine-learning"),
    ("natural language processing", "machine-learning"),
    ("computer vision image recognition", "machine-learning"),
    ("reinforcement learning", "machine-learning"),
    ("model training and evaluation", "machine-learning"),
    ("feature engineering", "machine-learning"),
    ("transfer learning", "machine-learning"),
    ("large language model", "machine-learning"),
    ("embedding vector representation", "machine-learning"),
    ("recommendation system", "machine-learning"),
    ("anomaly detection", "machine-learning"),
    ("data pipeline processing", "data-engineering"),
    ("etl extract transform load", "data-engineering"),
    ("data warehouse", "data-engineering"),
    ("stream processing real-time", "data-engineering"),
    ("batch data processing", "data-engineering"),
    ("data lake storage", "data-engineering"),
    ("data quality validation", "data-engineering"),
    ("schema management", "data-engineering"),
    ("application security", "security"),
    ("encryption and cryptography", "security"),
    ("access control authorization", "security"),
    ("vulnerability scanning", "security"),
    ("penetration testing", "security"),
    ("security audit compliance", "security"),
    ("input validation sanitization", "security"),
    ("cross site scripting prevention", "security"),
    ("sql injection prevention", "security"),
    ("unit testing", "testing"),
    ("integration testing", "testing"),
    ("end to end testing", "testing"),
    ("test driven development", "testing"),
    ("property based testing", "testing"),
    ("performance benchmarking", "testing"),
    ("load testing", "testing"),
    ("mocking and stubbing", "testing"),
    ("code coverage analysis", "testing"),
    ("event driven architecture", "architecture-patterns"),
    ("domain driven design", "architecture-patterns"),
    ("clean architecture", "architecture-patterns"),
    ("hexagonal architecture", "architecture-patterns"),
    ("cqrs command query separation", "architecture-patterns"),
    ("saga pattern distributed transactions", "architecture-patterns"),
    ("circuit breaker pattern", "architecture-patterns"),
    ("observer pattern", "architecture-patterns"),
    ("factory pattern", "architecture-patterns"),
    ("dependency injection", "architecture-patterns"),
    ("plugin architecture", "architecture-patterns"),
    ("async await programming", "concurrency"),
    ("multi-threaded programming", "concurrency"),
    ("concurrent data structures", "concurrency"),
    ("message passing concurrency", "concurrency"),
    ("actor model", "concurrency"),
    ("lock free programming", "concurrency"),
    ("parallel computing", "concurrency"),
    ("task scheduling", "concurrency"),
    ("network programming", "networking"),
    ("tcp ip networking", "networking"),
    ("dns domain name system", "networking"),
    ("proxy and reverse proxy", "networking"),
    ("vpn virtual private network", "networking"),
    ("network security firewall", "networking"),
    ("monitoring and observability", "devops"),
    ("logging and tracing", "devops"),
    ("alerting system", "devops"),
    ("deployment automation", "devops"),
    ("configuration management", "devops"),
    ("incident response", "devops"),
    ("site reliability engineering", "devops"),
    ("chaos engineering", "devops"),
    ("ios application development", "mobile-development"),
    ("android application development", "mobile-development"),
    ("cross platform mobile", "mobile-development"),
    ("react native mobile", "mobile-development"),
    ("flutter mobile development", "mobile-development"),
    ("mobile ui design", "mobile-development"),
    ("operating system development", "systems-programming"),
    ("memory management", "systems-programming"),
    ("file system operations", "systems-programming"),
    ("process management", "systems-programming"),
    ("system call interface", "systems-programming"),
    ("embedded systems programming", "systems-programming"),
    ("device driver development", "systems-programming"),
    ("real-time operating system", "systems-programming"),
    ("build system automation", "build-and-tooling"),
    ("package management", "build-and-tooling"),
    ("code generation", "build-and-tooling"),
    ("linting and formatting", "build-and-tooling"),
    ("refactoring tools", "build-and-tooling"),
    ("ide integration", "build-and-tooling"),
    ("version control git", "build-and-tooling"),
    ("monorepo management", "build-and-tooling"),
    ("api documentation", "documentation"),
    ("technical writing", "documentation"),
    ("code documentation", "documentation"),
    ("user guide manual", "documentation"),
    ("architecture decision record", "documentation"),
    ("changelog release notes", "documentation"),
    ("functional programming patterns", "functional-programming"),
    ("immutable data structures", "functional-programming"),
    ("higher order functions", "functional-programming"),
    ("monads and functors", "functional-programming"),
    ("pattern matching", "functional-programming"),
    ("type inference", "functional-programming"),
    ("game engine development", "game-development"),
    ("game physics simulation", "game-development"),
    ("rendering graphics pipeline", "game-development"),
    ("game audio programming", "game-development"),
    ("game networking multiplayer", "game-development"),
    ("smart contract development", "blockchain"),
    ("decentralized application", "blockchain"),
    ("consensus algorithm", "blockchain"),
    ("cryptocurrency token", "blockchain"),
    ("performance optimization", "performance"),
    ("memory optimization", "performance"),
    ("cache optimization strategy", "performance"),
    ("profiling and benchmarking", "performance"),
    ("algorithmic complexity", "performance"),
    ("resource management", "performance"),
    ("json serialization", "serialization"),
    ("protocol buffers", "serialization"),
    ("yaml configuration", "serialization"),
    ("binary serialization", "serialization"),
    ("xml processing", "serialization"),
    ("full text search", "search"),
    ("semantic search", "search"),
    ("search ranking algorithm", "search"),
    ("information retrieval", "search"),
    ("inverted index", "search"),
    ("compiler design", "compiler"),
    ("parser and lexer", "compiler"),
    ("abstract syntax tree", "compiler"),
    ("code optimization passes", "compiler"),
    ("intermediate representation", "compiler")
  )

  /** The deterministic stand-in embedding shared with store_points'
    * digest scheme (Ingest.pointRows): 16 md5 nibbles of the text,
    * v/8 − 1 per coordinate. The real system embeds with a sentence
    * model (tier2.rs docs); the container has none, so classification
    * runs over this fake tower — the SELECTION machinery (threshold,
    * per-category retention, truncation) is the operator under test,
    * exactly like the multimodal module's fake encoder.
    */
  def digestEmbed(text: Column, dim: Int = 16): Column =
    array((0 until dim).map(j =>
      conv(substring(md5(text), j + 1, 1), 16, 10).cast("double") / 8.0 - 1.0): _*)

  /** Tier2Tagger::classify (tier2.rs:167) over a (doc_id, embedding)
    * frame: cosine against every taxonomy-term embedding (the ~190-row
    * table BROADCAST over one scan), matches below the 0.35 default
    * threshold dropped (compared on round(score,6) for engine
    * stability), score-descending order, per-category retention — the
    * best term of each category always survives, a further term only
    * when it trails the category best by MORE than min_score_gap × 3
    * (tier2.rs:193) — then truncation to max_tags. Ties order by term
    * (the reference's unstable float sort never ties on real scores).
    */
  def tier2ClassifyOf(docs: DataFrame, threshold: Double = 0.35,
                      maxTags: Int = 10, minScoreGap: Double = 0.02): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tax = taxonomy.toDF("term", "category")
      .withColumn("tax_emb", digestEmbed(col("term")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("category"))
      .orderBy(col("score").desc, col("term"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    docs.crossJoin(broadcast(tax))
      .withColumn("score",
        round(graft.GraftFunctions.cosine(col("embedding"), col("tax_emb")), 6))
      .filter(col("score") >= threshold)
      .withColumn("cat_best", max(col("score")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"), col("category"))))
      .withColumn("cat_rnk", row_number().over(w))
      .filter(col("cat_rnk") === 1 || col("cat_best") - col("score") > minScoreGap * 3)
      .withColumn("rnk", row_number().over(wDoc))
      .filter(col("rnk") <= maxTags)
      .select(col("doc_id"), col("rnk"), col("term"), col("category"), col("score"))
  }

  /** tier2_tags query: classification of each document's digest
    * embedding against the full taxonomy. */
  def tier2Tags(spark: SparkSession, dir: String): DataFrame =
    tier2ClassifyOf(Tables.documents(spark, dir)
      .select(col("doc_id"), digestEmbed(col("text")).as("embedding")))
      .orderBy(col("doc_id"), col("rnk"))
}
