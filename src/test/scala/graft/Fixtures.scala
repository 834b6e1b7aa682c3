package graft

/** Golden fixtures re-created from the reference's integration corpus
  * (testdata/statefulIntegrationTests JSON files — public AWS CloudTrail
  * sample events; schemas catalogued in FIXTURES.md). The expected
  * outputs come from integration_test.go:190-204 (s2s join) and
  * integration_test.go:324-337 (agg).
  */
object Fixtures {

  /** AssumeRole event: Bob assumes EC2-dev; the s2s build side. */
  val assumeRoleEvent: String =
    """{
      |  "eventVersion": "1.05",
      |  "userIdentity": {
      |    "type": "IAMUser",
      |    "principalId": "AIDAQRSTUVWXYZEXAMPLE",
      |    "arn": "arn:aws:iam::777788889999:user/Bob",
      |    "accountId": "777788889999",
      |    "accessKeyId": "AKIAQRSTUVWXYZEXAMPLE",
      |    "userName": "Bob"
      |  },
      |  "eventTime": "2014-07-18T15:07:39Z",
      |  "eventSource": "sts.amazonaws.com",
      |  "eventName": "AssumeRole",
      |  "awsRegion": "us-east-2",
      |  "sourceIPAddress": "192.0.2.101",
      |  "userAgent": "aws-cli/1.11.10",
      |  "requestParameters": {
      |    "roleArn": "arn:aws:iam::777788889999:role/EC2-dev",
      |    "roleSessionName": "Bob-EC2-dev",
      |    "serialNumber": "arn:aws:iam::777788889999:mfa"
      |  },
      |  "responseElements": {
      |    "credentials": {
      |      "sessionToken": "encoded session token blob",
      |      "accessKeyId": "AKIAQRSTUVWXYZEXAMPLE",
      |      "expiration": "Jul 18, 2014 4:07:39 PM"
      |    },
      |    "assumedRoleUser": {
      |      "assumedRoleId": "AIDAQRSTUVWXYZEXAMPLE:Bob-EC2-dev",
      |      "arn": "arn:aws:sts::777788889999:assumed-role/EC2-dev/Bob-EC2-dev"
      |    }
      |  },
      |  "resources": [
      |    {
      |      "ARN": "arn:aws:iam::111122223333:role/EC2-dev",
      |      "accountId": "111122223333",
      |      "type": "AWS::IAM::Role"
      |    }
      |  ],
      |  "requestID": "4EXAMPLE-0e8d-11e4-96e4-e55c0EXAMPLE",
      |  "sharedEventID": "bEXAMPLE-efea-4a70-b951-19a88EXAMPLE",
      |  "eventID": "dEXAMPLE-ac7f-466c-a608-4ac8dEXAMPLE",
      |  "eventType": "AwsApiCall",
      |  "recipientAccountId": "111122223333"
      |}""".stripMargin.replaceAll("\n", " ")

  /** CreateUser by the assumed role, no MFA; the s2s probe side and the
    * agg rule's input.
    */
  val createUserEvent: String =
    """{
      |  "eventVersion": "1.05",
      |  "userIdentity": {
      |    "type": "AssumedRole",
      |    "principalId": "AIDAQRSTUVWXYZEXAMPLE:Bob-EC2-dev",
      |    "arn": "arn:aws:sts::777788889999:assumed-role/AssumeNothing/devdsk",
      |    "accountId": "777788889999",
      |    "accessKeyId": "AKIAQRSTUVWXYZEXAMPLE",
      |    "sessionContext": {
      |      "attributes": {
      |        "mfaAuthenticated": "false",
      |        "creationDate": "2016-11-14T17:25:26Z"
      |      },
      |      "sessionIssuer": {
      |        "type": "Role",
      |        "principalId": "AIDAQRSTUVWXYZEXAMPLE",
      |        "arn": "arn:aws:iam::777788889999:role/AssumeNothing",
      |        "accountId": "777788889999",
      |        "userName": "AssumeNothing"
      |      }
      |    }
      |  },
      |  "eventTime": "2016-11-14T17:25:45Z",
      |  "eventSource": "s3.amazonaws.com",
      |  "eventName": "CreateUser",
      |  "awsRegion": "us-east-2",
      |  "sourceIPAddress": "192.0.2.1",
      |  "userAgent": "[aws-cli/1.11.10]",
      |  "requestParameters": {
      |    "userName": "god_user"
      |  },
      |  "responseElements": {
      |    "user": {
      |      "path": "/",
      |      "arn": "arn:aws:iam::777788889999:user/god_user",
      |      "userName": "god_user",
      |      "userId": "AIDAQRSTUVWXYZEXAMPLE",
      |      "createDate": "Nov 14, 2017 12:00:03 AM"
      |    }
      |  },
      |  "requestID": "EXAMPLE463D56D4C",
      |  "eventID": "dEXAMPLE-265a-41e0-9352-4401bEXAMPLE",
      |  "eventType": "AwsApiCall",
      |  "recipientAccountId": "777788889999"
      |}""".stripMargin.replaceAll("\n", " ")

  /** A certstream record matching the domain_cert_issued rule. */
  val certStreamEvent: String =
    """{"message_type": "certificate_update", "timestamp": 1500000000.5,
      | "data": {"update_type": "X509LogEntry",
      |   "leaf_cert": {"subject": {"aggregated": "/CN=www.example.org", "CN": "www.example.org"},
      |     "not_before": 1490000000.0, "not_after": 1520000000.0,
      |     "all_domains": ["example.org", "www.example.org"]},
      |   "cert_index": 12345, "seen": 1500000000.5,
      |   "source": {"url": "ct.example.com", "name": "Example CT Log"}}}""".stripMargin
      .replaceAll("\n", " ")

  /** The golden pipeline config shape (testdata/pipelines/config.json). */
  val pipelineConfig: String =
    """{
      |  "eventFolder": "testdata/eventTypes",
      |  "rules": {
      |    "searchConversation": {
      |      "source": "fileInput",
      |      "plugin": "aRule",
      |      "sink": "fileOutput"
      |    },
      |    "lengthRule": {
      |      "source": "fileInput",
      |      "plugin": "lengthRule",
      |      "sink": "fileOutput"
      |    }
      |  },
      |  "states": {},
      |  "sources": {
      |    "fileInput": {
      |      "type": "File",
      |      "file_config": {"path": "testdata/pipelines/input"}
      |    }
      |  },
      |  "sinks": {
      |    "fileOutput": {
      |      "type": "File",
      |      "file_config": {"path": "testdata/pipelines/output"}
      |    }
      |  }
      |}""".stripMargin
}
