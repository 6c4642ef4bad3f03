package graft.repair

import org.apache.hadoop.conf.Configuration

/** Fail-fast S3 readiness validation, mirroring the reference's startup
  * config check (`/root/reference/src/app.ts:6-7` /
  * `validators.ts:3-12` — it refuses to start when the S3 settings are
  * absent, instead of failing hours into a listing). For an `s3a://`
  * target this verifies, before any distributed work is scheduled:
  *
  *  1. the S3A connector class is on the classpath (the hadoop-aws +
  *     aws-sdk bundle jars are NOT part of a stock Spark distribution);
  *  2. some credential source is configured — explicit keys, a
  *     credentials-provider class, or the standard AWS environment
  *     variables. Instance-profile (IMDS) credentials are invisible
  *     from here, so `spark.graft.s3a.assumeInstanceCredentials=true`
  *     (or the equivalent hadoop conf key) opts out of check 2.
  *
  * Non-s3a schemes (file://, hdfs://, …) pass through untouched.
  */
object S3ACheck {

  def validate(conf: Configuration, dir: String): Unit = {
    val scheme = try new java.net.URI(dir).getScheme
    catch { case _: java.net.URISyntaxException => null }
    if (scheme != "s3a") return

    val impl = conf.get("fs.s3a.impl", "org.apache.hadoop.fs.s3a.S3AFileSystem")
    try Class.forName(impl)
    catch {
      case _: ClassNotFoundException =>
        throw new IllegalStateException(
          s"$dir is an s3a:// path but $impl is not on the classpath. " +
            "Add hadoop-aws and the AWS SDK bundle jars matching your " +
            "Hadoop version (e.g. --packages org.apache.hadoop:hadoop-aws:<hadoop version>).")
    }

    val hasKeys = conf.get("fs.s3a.access.key") != null &&
      conf.get("fs.s3a.secret.key") != null
    val hasProvider = conf.get("fs.s3a.aws.credentials.provider") != null
    val hasEnv = Seq("AWS_ACCESS_KEY_ID", "AWS_PROFILE",
      "AWS_WEB_IDENTITY_TOKEN_FILE",
      "AWS_CONTAINER_CREDENTIALS_RELATIVE_URI").exists(sys.env.contains)
    val assumeInstance =
      conf.getBoolean("spark.graft.s3a.assumeInstanceCredentials", false)
    if (!hasKeys && !hasProvider && !hasEnv && !assumeInstance)
      throw new IllegalArgumentException(
        s"No S3 credentials configured for $dir: set fs.s3a.access.key/" +
          "fs.s3a.secret.key, fs.s3a.aws.credentials.provider, the AWS_* " +
          "environment variables, or spark.graft.s3a.assumeInstanceCredentials=true " +
          "when running under an instance profile.")
  }
}
